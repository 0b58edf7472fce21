"""Registry factory used by the CLI test (python -m spatula_spark)."""

import json


def upper_dump(data, f):
    """Custom dump function fixture (reference --dump, cli.py:382)."""
    json.dump({k.upper(): v for k, v in data.items()}, f)

from spatula_spark.operators.parsers import element_text
from spatula_spark.operators.selectors import CSS
from spatula_spark.plans.pagespec import ChildPage, PageRegistry, PageSpec


def build_registry() -> PageRegistry:
    reg = PageRegistry()
    reg.register(PageSpec(
        name="FruitList",
        process_page=lambda ctx: [
            ChildPage("FruitDetail", {"name": element_text(a)},
                      source=a.get("href"))
            for a in CSS("a").match(ctx.root)
        ],
    ))
    reg.register(PageSpec(
        name="FruitDetail",
        process_page=lambda ctx: {**ctx.input, **ctx.json},
    ))

    # input synthesis fixtures (reference tests/test_cli.py:186-224)
    from dataclasses import dataclass

    @dataclass
    class FruitInput:
        name: str
        region: str

    reg.register(PageSpec(
        name="TypedInputPage",
        input_type=FruitInput,
        source="http://f.example.com/d/apple",
        process_page=lambda ctx: {
            "name": ctx.input["name"], "region": ctx.input["region"],
        },
    ))
    reg.register(PageSpec(
        name="ExampleInputPage",
        example_input={"name": "banana", "region": "tropics"},
        source="http://f.example.com/d/apple",
        process_page=lambda ctx: dict(ctx.input),
    ))
    return reg
