"""LLM-data-pipeline extension operators (BASELINE.json north star):
deduplication, similarity search, text analysis, multimodal column
plumbing — all designed partition-parallel for 100 TB inputs.
"""
