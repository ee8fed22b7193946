"""Multi-chip execution: mesh helpers, the batched/sharded corpus
throughput engine, and single-utterance sequence parallelism.

Lazy imports keep `import speedy_tpu` light — batch/seqpar pull in the
full op stack.
"""


def __getattr__(name):
    if name in ("make_mesh", "batch_sharding"):
        from . import mesh

        return getattr(mesh, name)
    if name in (
        "CorpusEngine",
        "batched_analysis",
        "batched_nonlinear_speedup",
        "batched_nonlinear_speedup_multichannel",
        "compile_batch_step",
        "compile_packed_batch_step",
    ):
        from . import batch

        return getattr(batch, name)
    if name in (
        "analysis_seq_parallel",
        "wsola_seq_parallel",
        "nonlinear_speedup_seq_parallel",
    ):
        from . import seqpar

        return getattr(seqpar, name)
    raise AttributeError(name)


__all__ = [
    "make_mesh",
    "batch_sharding",
    "CorpusEngine",
    "batched_analysis",
    "batched_nonlinear_speedup",
    "batched_nonlinear_speedup_multichannel",
    "compile_batch_step",
    "compile_packed_batch_step",
    "analysis_seq_parallel",
    "wsola_seq_parallel",
    "nonlinear_speedup_seq_parallel",
]
