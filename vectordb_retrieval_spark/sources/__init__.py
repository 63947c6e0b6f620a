"""Dataset sources: generators, binary/text vector readers, schema
inference, and dataprep pipelines (SURVEY.md §2.1)."""
