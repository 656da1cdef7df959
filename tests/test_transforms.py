"""Unit tests for the columnar transform ports (SURVEY.md §2.2), using the
nested bill-shaped fixture from FIXTURES.md §4a and the date-parser edge
cases from §4d."""

import datetime

from pyspark.sql import Row
from pyspark.sql import functions as F

from etl_api_bigquery_spark.functions.transforms import (
    audit_columns, explode_children, flatten_struct, null_pad_to_schema,
    parse_date_ddmmyyyy, parse_date_iso, safe_cast, widen_money)


def bills_df(spark):
    return spark.createDataFrame([
        Row(id=1, date="2024-03-15",
            customer=Row(id=10, name="An", mobile="09", address="HN"),
            payment=Row(amount=100.0,
                        cash=Row(amount=40.0),
                        transfer=Row(amount=60.0, accountId=7),
                        credit=Row(amount=0.0)),
            products=[Row(id=100, name="p1", quantity=2, price=5),
                      Row(id=None, name="p2", quantity=1, price=3)]),
        Row(id=2, date="not-a-date", customer=None, payment=None, products=None),
    ])


def test_flatten_struct_23col_style(spark):
    """P1: dotted-path projection incl. doubly-nested payment.cash.amount;
    missing structs -> NULL (reference loader.py:42-156)."""
    df = flatten_struct(bills_df(spark), {
        "id": "id",
        "customer_id": "customer.id",
        "customer_name": "customer.name",
        "payment_total_amount": "payment.amount",
        "payment_cash_amount": "payment.cash.amount",
        "payment_transfer_account_id": "payment.transfer.accountId",
    })
    rows = {r.id: r for r in df.collect()}
    assert rows[1].payment_cash_amount == 40.0
    assert rows[1].payment_transfer_account_id == 7
    assert rows[2].customer_id is None and rows[2].payment_total_amount is None


def test_explode_children_with_pos_fallback(spark):
    """P3: one child row per product, parent FK stamped, NULL id -> positional
    fallback (reference extractor.py:217-282)."""
    df = explode_children(
        bills_df(spark), "products",
        parent_cols={"bill_id": "id", "bill_date": "date"},
        child_cols={"product_id": "id", "product_name": "name",
                    "quantity": "quantity"},
        pos_fallback_id="product_id")
    rows = sorted(df.collect(), key=lambda r: (r.bill_id, r.product_name))
    assert len(rows) == 2  # bill 2 has NULL products -> no child rows
    assert rows[0].product_id == "100"
    assert rows[1].product_id == "idx_1"  # positional fallback
    assert all(r.bill_id == 1 for r in rows)


def test_date_parsers(spark):
    df = spark.createDataFrame(
        [("2024-03-15", "15/03/2024"),
         ("not-a-date", "(dự kiến) 01/01/2025"),
         (None, "ab/cd/2024"),
         ("2024-13-99", "32/13/1899")],
        ["iso", "vn"])
    out = df.select(parse_date_iso("iso").alias("a"),
                    parse_date_ddmmyyyy("vn").alias("b")).collect()
    assert out[0].a == datetime.date(2024, 3, 15)
    assert out[0].b == datetime.date(2024, 3, 15)
    assert all(r.a is None and r.b is None for r in out[1:])


def test_safe_cast_and_widen(spark):
    df = spark.createDataFrame([("12", 3), ("", 4), ("x", 5)], ["s", "i"])
    out = df.select(safe_cast("s", "int").alias("v"),
                    widen_money("i").alias("w")).collect()
    assert [r.v for r in out] == [12, None, None]
    assert all(isinstance(r.w, float) for r in out)


def test_null_pad_to_schema(spark):
    df = spark.createDataFrame([(1, "x", 99)], ["a", "b", "extra"])
    out = null_pad_to_schema(df, {"a": "long", "b": "string", "c": "double"})
    assert out.columns == ["a", "b", "c"]  # extra dropped, c padded
    r = out.collect()[0]
    assert r.c is None


def test_audit_columns_event_derived(spark):
    df = spark.createDataFrame([(1, datetime.datetime(2024, 5, 1, 12))],
                               ["id", "event_ts"])
    out = audit_columns(df).collect()[0]
    assert out.ingest_date == datetime.date(2024, 5, 1)
    assert '"id":1' in out.raw_record
