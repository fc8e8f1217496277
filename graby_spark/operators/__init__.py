"""Large-scale training-data pipeline operators over the documents/pages
tables: deduplication, similarity search, text analysis, multimodal
plumbing.  All operators are DataFrame→DataFrame and Spark-first: built-in
functions where possible, Arrow-batched pandas UDFs where not."""
