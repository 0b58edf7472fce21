"""CLI parity (reference tests/test_cli.py): scrape writes one JSON
file per item, scout writes scout.json, test prints numbered items."""

import json
import os

from pyspark.sql import functions as F

from spatula_spark.__main__ import main
from spatula_spark.urls import canonicalize_url, url_hash


def _store(spark, tmp_path):
    base = "http://f.example.com"
    rows = [
        (
            f"{base}/list", "f.example.com", "list", 200, "html",
            (
                '<html><body>'
                f'<a href="{base}/d/apple">apple</a>'
                f'<a href="{base}/d/kiwi">kiwi</a>'
                "</body></html>"
            ).encode(),
            None, None, None, 0,
        ),
        (f"{base}/d/apple", "f.example.com", "detail", 200, "json",
         json.dumps({"color": "red"}).encode(), None, None, None, 0),
        (f"{base}/d/kiwi", "f.example.com", "detail", 200, "json",
         json.dumps({"color": "green"}).encode(), None, None, None, 0),
    ]
    df = spark.createDataFrame(
        rows,
        "url string, host string, kind string, status int, "
        "payload_kind string, payload binary, links array<string>, "
        "next_url string, image_id string, flaky_rejects int",
    ).withColumn("canon_url", canonicalize_url(F.col("url"))).withColumn(
        "url_hash", url_hash(F.col("canon_url"))
    )
    path = str(tmp_path / "store.parquet")
    df.write.parquet(path)
    return path


def test_cli_scrape_json_files(spark, tmp_path, capsys):
    store = _store(spark, tmp_path)
    out = str(tmp_path / "items")
    rc = main([
        "scrape", "tests.cli_fixture", "FruitList",
        "--store", store, "--url", "http://f.example.com/list",
        "-o", out, "--cores", "8",
    ])
    assert rc == 0
    files = sorted(os.listdir(out))
    assert len(files) == 2  # reference golden: one file per item
    items = [json.load(open(os.path.join(out, f))) for f in files]
    assert items == [
        {"name": "apple", "color": "red"},
        {"name": "kiwi", "color": "green"},
    ]


def test_cli_scout(spark, tmp_path, capsys):
    store = _store(spark, tmp_path)
    out = str(tmp_path / "scout.json")
    rc = main([
        "scout", "tests.cli_fixture", "FruitList",
        "--store", store, "--url", "http://f.example.com/list",
        "-o", out, "--cores", "8",
    ])
    assert rc == 0
    data = json.load(open(out))
    assert data == [
        {"data": {"name": "apple"},
         "__next__": "FruitDetail source=http://f.example.com/d/apple"},
        {"data": {"name": "kiwi"},
         "__next__": "FruitDetail source=http://f.example.com/d/kiwi"},
    ]


def test_cli_test_command(spark, tmp_path, capsys):
    store = _store(spark, tmp_path)
    rc = main([
        "test", "tests.cli_fixture", "FruitList",
        "--store", store, "--url", "http://f.example.com/list",
        "--cores", "8", "--no-pagination",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "1:" in out and "2:" in out
    assert "pagination not followed" in out


def test_cli_test_data_pairs_and_placeholders(spark, tmp_path, capsys):
    """Reference tests/test_cli.py:186-224 shapes: -d name=value pairs
    fill input_type fields; missing fields get ~field placeholders."""
    store = _store(spark, tmp_path)
    rc = main([
        "test", "tests.cli_fixture", "TypedInputPage",
        "--store", store, "--cores", "8",
        "-d", "name=apple",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "TypedInputPage expects input (FruitInput):" in out
    assert "name: apple" in out
    assert "region: ~region" in out
    assert '"region": "~region"' in out  # placeholder reached the page


def test_cli_test_example_input_override(spark, tmp_path, capsys):
    store = _store(spark, tmp_path)
    rc = main([
        "test", "tests.cli_fixture", "ExampleInputPage",
        "--store", store, "--cores", "8",
        "-d", "region=poles",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert '"name": "banana"' in out
    assert '"region": "poles"' in out


def test_cli_test_interactive_prompt(spark, tmp_path, capsys, monkeypatch):
    store = _store(spark, tmp_path)
    monkeypatch.setattr("builtins.input", lambda prompt="": "prompted")
    rc = main([
        "test", "tests.cli_fixture", "TypedInputPage",
        "--store", store, "--cores", "8",
        "-d", "name=apple", "--interactive",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert '"region": "prompted"' in out


def test_cli_scrape_custom_dump(spark, tmp_path, capsys):
    store = _store(spark, tmp_path)
    out_dir = str(tmp_path / "dumped")
    rc = main([
        "scrape", "tests.cli_fixture", "FruitList",
        "--store", store, "--url", "http://f.example.com/list",
        "-o", out_dir, "--cores", "8",
        "--dump", "tests.cli_fixture:upper_dump",
    ])
    assert rc == 0
    files = sorted(os.listdir(out_dir))
    items = [json.load(open(os.path.join(out_dir, f))) for f in files]
    assert items == [
        {"NAME": "apple", "COLOR": "red"},
        {"NAME": "kiwi", "COLOR": "green"},
    ]


def test_cli_shell_locals(spark, tmp_path):
    """spatula shell (reference cli.py:192-216): url/resp/root bound,
    selectors importable — namespace asserted without a console."""
    import argparse

    from spatula_spark.__main__ import build_shell_locals

    store = _store(spark, tmp_path)
    args = argparse.Namespace(
        url="http://f.example.com/list", store=store, live=False,
        verb="GET", user_agent="t", header=[], timeout=5.0, cores="8",
    )
    ns = build_shell_locals(args)
    assert ns["resp"]["status"] == 200
    assert [a.get("href") for a in ns["CSS"]("a").match(ns["root"])] == [
        "http://f.example.com/d/apple", "http://f.example.com/d/kiwi",
    ]
    assert ns["root"].tag == "html"


def test_cli_scrape_dir_management(spark, tmp_path, capsys, monkeypatch):
    """Twin of reference tests/test_cli.py:45-59 + cli.py:395-418: no
    -o -> auto-numbered _scrapes/DATE/NNN (001 then 002); -o to an
    existing non-empty dir is refused with exit 1 unless --rmdir
    clears it."""
    import datetime

    monkeypatch.chdir(tmp_path)
    store = _store(spark, tmp_path)
    base_args = [
        "scrape", "tests.cli_fixture", "FruitList",
        "--store", store, "--url", "http://f.example.com/list",
        "--cores", "8",
    ]
    today = datetime.date.today().strftime("%Y-%m-%d")

    assert main(base_args) == 0
    assert f"success: wrote 2 objects to _scrapes/{today}/001" in (
        capsys.readouterr().out
    )
    assert main(base_args) == 0  # second run auto-increments
    assert f"success: wrote 2 objects to _scrapes/{today}/002" in (
        capsys.readouterr().out
    )

    out = str(tmp_path / "mydir")
    assert main(base_args + ["-o", out]) == 0
    assert f"success: wrote 2 objects to {out}" in capsys.readouterr().out
    # non-empty existing dir: refused, nothing overwritten
    before = sorted(os.listdir(out))
    assert main(base_args + ["-o", out]) == 1
    assert f"{out} exists and is not empty" in capsys.readouterr().out
    assert sorted(os.listdir(out)) == before
    # --rmdir: cleared and rewritten
    assert main(base_args + ["-o", out, "--rmdir"]) == 0
    got = capsys.readouterr().out
    assert f"{out} exists and was cleared" in got
    assert f"success: wrote 2 objects to {out}" in got
