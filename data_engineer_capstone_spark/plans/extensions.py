"""LLM-data-pipeline extension queries (SURVEY.md §2.9 Q90-Q92 + the
dedup / similarity-search / text-analysis family).

Populated in the extensions milestone — see
``data_engineer_capstone_spark.operators``.
"""
