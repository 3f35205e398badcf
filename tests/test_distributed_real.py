"""Real 2-process ``jax.distributed`` runtime test (VERDICT r2 #1).

Unlike the in-process emulation in ``__graft_entry__``, this launches two
actual OS processes that call ``jax.distributed.initialize`` against a
localhost coordinator and feed disjoint ``H5Batcher`` shards through the
multi-process branch of ``put_global`` (via ``device_prefetch``). The
asserted loss must match a single-process assembly of the same global batch.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sky_embeddings_tpu.data.synthetic import write_synthetic_h5


@pytest.mark.slow
def test_two_real_processes_match_single_process(tmp_path):
    # bounded by run_two_process_smoke's own 300 s subprocess timeout
    from tools.distributed_smoke import run_two_process_smoke

    path = write_synthetic_h5(
        str(tmp_path / "smoke.h5"), n=128, channels=3, img_size=16, seed=3
    )
    res = run_two_process_smoke(path)
    (l0, g0), (l1, g1) = res["per_process"][0], res["per_process"][1]
    lo, go = res["oracle"]
    # both processes see the same fully-replicated scalars…
    assert l0 == pytest.approx(l1, rel=1e-6)
    assert g0 == pytest.approx(g1, rel=1e-6)
    # …and they equal the single-process assembly of the same global batch
    assert l0 == pytest.approx(lo, rel=1e-5)
    assert g0 == pytest.approx(go, rel=1e-5)
    assert np.isfinite([l0, g0]).all()
