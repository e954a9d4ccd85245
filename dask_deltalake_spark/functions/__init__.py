"""LLM-data-pipeline extension operators (SURVEY.md §2.3): dedup,
similarity search, text analysis, multimodal column plumbing — all
designed Spark-first for 100 TB inputs."""
