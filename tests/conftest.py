import pytest
from pyspark.sql import SparkSession


@pytest.fixture(scope="session")
def spark() -> SparkSession:
    from spatula_spark.session import get_spark

    s = get_spark(app_name="spatula_spark_tests", cores=8, shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def tiny_store(spark):
    """Minimal page-store backing the parity fixtures: every non-Null
    URL the golden specs reference, one row each."""
    import json

    from pyspark.sql import functions as F

    from spatula_spark.urls import canonicalize_url, url_hash

    def row(url, status=200, kind="detail", payload_kind="json",
            payload=None, links=None, next_url=None, flaky=0):
        return (url, url.split("/")[2], kind, status, payload_kind,
                payload.encode() if isinstance(payload, str) else payload,
                links, next_url, None, flaky)

    rows = [
        row("http://pg.example.com/page2", payload=json.dumps({})),
        row("http://bad.example.com/err", status=500),
        row("http://ok.example.com/after-error", payload=json.dumps({})),
        row("http://r.example.com/flaky", payload=json.dumps({}), flaky=2),
        row("http://dep.example.com/awards",
            payload=json.dumps({"award": "gold"})),
        row("http://in.example.com/from-input", payload=json.dumps({})),
        row(
            "http://csv.example.com/data",
            payload_kind="csv",
            payload="a,b,c\n1,2,3\n4,5,6\n",
        ),
        row(
            "http://html.example.com/list",
            payload_kind="html",
            payload="<html><body><ul><li>one</li><li>two</li>"
            "<li>three</li></ul></body></html>",
        ),
    ]
    from fixtures_binary import make_pdf, make_xlsx

    rows.append(row(
        "http://pdf.example.com/doc",
        payload_kind="pdf",
        payload=make_pdf(
            b"BT /F1 12 Tf 72 720 Td (Hello World) Tj "
            b"0 -14 Td [(Col1) -500 (Col2)] TJ ET"
        ),
    ))
    rows.append(row(
        "http://xlsx.example.com/data",
        payload_kind="excel",
        payload=make_xlsx([["a", "b", "c"], [1, 2, 3], [4, 5, 6]]),
    ))
    df = spark.createDataFrame(
        rows,
        "url string, host string, kind string, status int, "
        "payload_kind string, payload binary, links array<string>, "
        "next_url string, image_id string, flaky_rejects int",
    )
    return (
        df.withColumn("canon_url", canonicalize_url(F.col("url")))
        .withColumn("url_hash", url_hash(F.col("canon_url")))
    )
