"""AOT prewarm: compiling the chunk programs ahead of data (VERDICT r2
item #3 — cold-start).  The compile key depends only on the problem
signature, so a prewarmed process must run its first real fit without
triggering any new chunk-step compiles."""

import numpy as np

import adelie_tpu as ad
from adelie_tpu.configs import set_configs


def _cache_size(fn):
    try:
        return fn._cache_size()
    except Exception:
        return None


def test_prewarm_dense_covers_fit():
    from adelie_tpu.solver.fused import get_gaussian_chunk_step

    rng = np.random.default_rng(0)
    n, p = 500, 2000
    X = rng.standard_normal((n, p)).astype(np.float64)
    beta = np.zeros(p)
    beta[:8] = rng.standard_normal(8)
    y = X @ beta + 0.3 * rng.standard_normal(n)

    try:
        set_configs("screen_all_max", 0)   # force real BASIL bucket growth
        Xm = ad.matrix.dense(X)
        t = ad.prewarm(Xm, max_screen=512)
        assert len(t) >= 2               # warmed several buckets
        step = get_gaussian_chunk_step(Xm, True, p)
        size_before = _cache_size(step)
        st = ad.grpnet(Xm, ad.glm.gaussian(y), lmda_path_size=20,
                       min_ratio=0.05, progress_bar=False)
        assert st.error == ""
        size_after = _cache_size(step)
    finally:
        set_configs("screen_all_max", None)
    if size_before is not None:
        # the fit visited only prewarmed buckets -> no new chunk compiles
        assert size_after == size_before, (size_before, size_after)


def test_prewarm_streamed_covers_fit(tmp_path):
    from adelie_tpu.solver.streamed import get_streamed_chunk_step

    data = ad.data.snp_unphased(300, 512, seed=3)
    f = str(tmp_path / "pw.snpdat")
    ad.io.snp_unphased(f).write(data["X"])
    io = ad.io.snp_unphased(f).read()
    try:
        set_configs("screen_all_max", 0)
        m = ad.matrix.snp_unphased(io, streaming=True, tile_snps=128,
                                   dtype=np.float64)
        ad.prewarm(m, max_screen=256)
        step = get_streamed_chunk_step()
        size_before = _cache_size(step)
        st = ad.grpnet(m, data["glm"], lmda_path_size=15, min_ratio=0.05,
                       progress_bar=False)
        assert st.error == ""
        size_after = _cache_size(step)
    finally:
        set_configs("screen_all_max", None)
    if size_before is not None:
        assert size_after == size_before, (size_before, size_after)


def test_prewarm_signature_only():
    # n/p-only signature (dense assumed) works without data
    t = ad.prewarm(n=128, p=256, max_screen=1)
    assert isinstance(t, dict) and len(t) >= 1
