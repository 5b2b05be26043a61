"""Tuning-layer tests: chip tables, autotune refit, persistence."""

import numpy as np

from spmv_tpu.io.generate import power_law_csr
from spmv_tpu.ops import tuning


def test_policy_tables_cover_generations():
    for chip in ("v4", "v5e", "v5p", "v6e"):
        for width in (2, 4, 8):
            pol = tuning.policy_for(width, chip=chip)
            assert pol.kappa % 2048 == 0
            assert 2048 <= pol.kappa <= 16384


def test_autotune_refit_and_override(tmp_path):
    A = power_law_csr(3000, 3000, 24000, seed=1)
    x = np.random.default_rng(0).standard_normal(3000).astype(np.float32)
    fields, sweep = tuning.autotune_stream(
        A, x, kappas=(8192, 12288), iters=4, verbose=False)
    assert fields["kappa"] in (8192, 12288)
    assert len(sweep) >= 1
    try:
        tuning.set_active(fields)
        assert tuning.policy_for(4).kappa == fields["kappa"]
        path = str(tmp_path / "table.json")
        tuning.save_table(fields, path)
        tuning.set_active(None)
        loaded = tuning.load_table(path)
        assert loaded == fields
        assert tuning.policy_for(4).kappa == fields["kappa"]
    finally:
        tuning.set_active(None)
