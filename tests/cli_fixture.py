"""Registry factory used by the CLI test (python -m spatula_spark)."""

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
    return reg
