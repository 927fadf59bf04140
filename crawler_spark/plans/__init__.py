"""Physical-plan introspection and audits.

The reference has no optimizer (SURVEY §4) — Catalyst supplies
pushdown, pruning, join selection, and codegen for free as long as the
engine stays declarative. This package verifies that it actually does:
:mod:`crawler_spark.plans.audit` captures formatted plans and asserts
the properties that matter at 100 TB (filters reach the scan, narrow
ReadSchema, broadcast vs shuffle joins, Python only where intended).
"""
