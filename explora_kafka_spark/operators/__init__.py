"""Large-scale training-data pipeline operators (dedup, similarity,
text analysis, multimodal) over the driver's `documents` / `embeddings`
tables. All hot paths are native Column expressions or Arrow-batched
Pandas UDFs — never row-at-a-time Python."""
