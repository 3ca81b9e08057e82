"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query at sf0.001. ``queries()`` maps
operator names → (spark, sf_dir) → DataFrame. ``oracle_sql()`` maps the
same names → DuckDB-runnable ANSI SQL over the pre-registered views.
Column names/aliases match between the two (the driver sorts columns by
name before value-hashing).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from oracledb_datapump_spark.operators import analytics as A


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return A.q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "q1_pricing_summary": A.q1_pricing_summary,
        "q3_shipping_priority": A.q3_shipping_priority,
        "q4_order_priority": A.q4_order_priority,
        "q5_local_supplier_volume": A.q5_local_supplier_volume,
        "q6_forecast_revenue": A.q6_forecast_revenue,
        "q12_shipping_delay": A.q12_shipping_delay,
        "q14_promo_effect": A.q14_promo_effect,
        "revenue_by_nation": A.revenue_by_nation,
        "top_suppliers_window": A.top_suppliers_window,
        "customer_order_set_ops": A.customer_order_set_ops,
        "events_hourly_rollup": A.events_hourly_rollup,
        "events_sessionize": A.events_sessionize,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "q1_pricing_summary": A.Q1_SQL,
        "q3_shipping_priority": A.Q3_SQL,
        "q4_order_priority": A.Q4_SQL,
        "q5_local_supplier_volume": A.Q5_SQL,
        "q6_forecast_revenue": A.Q6_SQL,
        "q12_shipping_delay": A.Q12_SQL,
        "q14_promo_effect": A.Q14_SQL,
        "revenue_by_nation": A.REVENUE_BY_NATION_SQL,
        "top_suppliers_window": A.TOP_SUPPLIERS_SQL,
        "customer_order_set_ops": A.SET_OPS_SQL,
        "events_hourly_rollup": A.EVENTS_HOURLY_SQL,
        "events_sessionize": A.EVENTS_SESSIONIZE_SQL,
    }
