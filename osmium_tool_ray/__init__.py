"""osmium_tool_ray — a Ray-Data-native spatial-join + tiling engine.

A from-scratch re-expression of the query/data-processing capabilities of
``osmcode/osmium-tool`` (reference at /root/reference, cited by file:line
throughout) as distributed ``ray.data.Dataset`` pipelines over Arrow tables
of geo-tagged image + caption rows.

Layout:
    functions/  pure vectorized kernels (numpy / pyarrow.compute), no Ray
    state/      region model + config parsers (driver-side)
    sources/    corpus synthesis, readers, checkpointed writers
    stages/     map_batches stages (stateless fns + stateful actor classes)
    pipelines/  full operators (extract strategies, id ops, merges, stats)
"""

__version__ = "0.1.0"
