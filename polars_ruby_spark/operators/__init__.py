"""Custom operators: row-index machinery, joins (equi + as-of), reshape,
upsample, dedup, similarity, text analysis, multimodal plumbing."""


def ensure_parallelism(sdf):
    """Repartition only when the scan gives fewer partitions than cores.

    CPU-heavy projections (shingle/hash/dot-product pipelines) on a small
    local file arrive as ONE partition and run single-threaded.  At 100 TB
    the scan already yields thousands of partitions and this is a no-op —
    no shuffle is added on the big path.
    """
    target = sdf.sparkSession.sparkContext.defaultParallelism
    if sdf.rdd.getNumPartitions() < target:
        return sdf.repartition(target)
    return sdf
