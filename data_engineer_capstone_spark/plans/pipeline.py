"""Reference star-schema pipeline queries (SURVEY.md §2.9 Q70-Q73).

Populated in the pipeline milestone — see ``data_engineer_capstone_spark.pipeline``.
"""
