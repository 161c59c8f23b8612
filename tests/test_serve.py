"""Serving-edge demo: the reference's dashboard routes must answer from
the Spark warehouse end-to-end (HTML tables + PNG charts), with all
numbers coming from the golden-tested plans/dashboard.py DataFrames."""

from __future__ import annotations

import os
import threading
import urllib.request
from http.server import ThreadingHTTPServer

import pytest

REF_DB = "/root/reference/assets/oltp/dummy_ojol_transactions_raw_only.sqlite"
FACT_TABLE = "dummy_ojol_transactions_raw_only_query_get_transaction_list_koto"

pytestmark = pytest.mark.skipif(
    not os.path.exists(REF_DB), reason="reference assets not present"
)


@pytest.fixture(scope="module")
def served(spark):
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from serve import make_handler

    from learn_etl_data_warehouse_spark.plans.warehouse import clean_fact
    from learn_etl_data_warehouse_spark.sources.sqlite import read_sqlite_table

    cleaned = clean_fact(
        read_sqlite_table(spark, REF_DB, FACT_TABLE, all_string=True)
    ).cache()
    cleaned.count()
    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(cleaned))
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{server.server_address[1]}"
    server.shutdown()
    cleaned.unpersist()


def _get(url: str) -> tuple[int, bytes]:
    with urllib.request.urlopen(url) as resp:
        return resp.status, resp.read()


def test_quarterly_endpoint_serves_golden_partition(served):
    status, body = _get(f"{served}/quarterly/2018Q4")
    assert status == 200
    page = body.decode()
    # golden partition facts surface in the page: nav list and mode
    # histogram categories (test_dashboard.py pins the exact counts)
    for expected in ("2018Q3", "2018Q4", "2019Q1", "hist_amount_delivery", "BIKE"):
        assert expected in page
    # capped table rendered
    assert "table (first 200)" in page


def test_mode_endpoint_and_png_chart(served):
    status, body = _get(f"{served}/mode/BIKE")
    assert status == 200
    assert "hist_hour_start" in body.decode()

    status, png = _get(f"{served}/quarterly/2018Q4/hist_amount_delivery.png")
    assert status == 200
    assert png[:8] == b"\x89PNG\r\n\x1a\n"  # real PNG magic
    assert len(png) > 100


def test_unknown_routes_404(served):
    import urllib.error

    for path in ("/nope/x", "/quarterly", "/quarterly/2018Q4/nope.png"):
        with pytest.raises(urllib.error.HTTPError) as e:
            _get(f"{served}{path}")
        assert e.value.code == 404


def test_quickstart_example_runs_clean(spark, tmp_path):
    """The examples/quickstart.py tour must run end-to-end (it is the
    documented first-contact surface — a broken example is a doc bug)."""
    import importlib.util
    import os

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "examples",
        "quickstart.py",
    )
    spec = importlib.util.spec_from_file_location("quickstart", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.main(str(tmp_path / "qs"))
