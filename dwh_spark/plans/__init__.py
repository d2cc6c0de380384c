from dwh_spark.plans.registry import ORACLES, QUERIES, query

__all__ = ["ORACLES", "QUERIES", "query"]
