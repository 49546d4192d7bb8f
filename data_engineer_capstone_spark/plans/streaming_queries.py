"""Structured Streaming queries (SURVEY.md §2.9 Q80-Q83).

Populated in the streaming milestone — see ``data_engineer_capstone_spark.streaming``.
"""
