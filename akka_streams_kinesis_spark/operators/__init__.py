"""Analytic operator surface (SURVEY.md §2.D) + LLM-pipeline operators.

Each module registers named queries into ``akka_streams_kinesis_spark.registry``.
"""
