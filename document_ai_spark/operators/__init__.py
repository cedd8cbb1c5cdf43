"""Training-data pipeline operators: dedup, similarity, text quality,
multimodal plumbing. All built-in-expression-first; every op has a
matching ANSI-SQL oracle in __spark_entry__.py."""
