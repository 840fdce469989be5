"""Custom operators: row-index machinery, joins (equi + as-of), reshape,
upsample, dedup, similarity, text analysis, multimodal plumbing."""
