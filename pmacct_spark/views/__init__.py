"""Derived views over the driver testdata."""

from pmacct_spark.views.flows import FLOWS_DUCK_CTE, flows_view

__all__ = ["FLOWS_DUCK_CTE", "flows_view"]
