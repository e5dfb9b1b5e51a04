"""Reference-format (torch) checkpoint import parity (SURVEY.md §2.1 ckpt row).

Builds a genuine DS2-class PyTorch model (Conv2d subsampler -> bidirectional
nn.LSTM -> Linear CTC head, torch's natural (B, T, C*F) conv->LSTM reshape),
converts its state_dict with training.torch_import, and asserts our flax
BiLSTMEncoder + ctc_head reproduce the torch logits.  torch 2.x CPU is the
parity oracle standing in for the absent reference (SURVEY.md §0).
"""

from __future__ import annotations

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp
from flax import linen as nn

from pytorch_asr_tpu.configs.base import BiLSTMEncoderConfig
from pytorch_asr_tpu.models.encoder_bilstm import BiLSTMEncoder
from pytorch_asr_tpu.training.torch_import import (
    TorchImportError, import_torch_bilstm_ctc)

MEL = 16
CONV = (4, 6)
H = 12
LAYERS = 2
V = 10


class TorchDS2(torch.nn.Module):
    def __init__(self, vocab: int = V):
        super().__init__()
        chans = [1, *CONV]
        self.convs = torch.nn.ModuleList(
            torch.nn.Conv2d(chans[i], chans[i + 1], kernel_size=3, stride=2,
                            padding=1)
            for i in range(len(CONV)))
        freq = MEL
        for _ in CONV:
            freq = (freq + 2 - 3) // 2 + 1
        self.lstm = torch.nn.LSTM(CONV[-1] * freq, H, num_layers=LAYERS,
                                  bidirectional=True, batch_first=True)
        self.fc = torch.nn.Linear(2 * H, vocab)

    def forward(self, feats):                       # (B, T, MEL)
        x = feats.unsqueeze(1)                      # (B, 1, T, F)
        for conv in self.convs:
            x = torch.relu(conv(x))
        B, C, T, F = x.shape
        x = x.permute(0, 2, 1, 3).reshape(B, T, C * F)   # torch (c*F+f) order
        x, _ = self.lstm(x)
        return self.fc(x)                           # (B, T, V)


@pytest.fixture(scope="module")
def torch_model():
    torch.manual_seed(0)
    return TorchDS2().eval()


@pytest.fixture(scope="module")
def torch_model_charvocab():
    """Same DS2 but with the framework's 31-char vocab (for Trainer tests)."""
    from pytorch_asr_tpu.data.tokenizer import CharTokenizer

    torch.manual_seed(1)
    return TorchDS2(vocab=CharTokenizer().vocab_size).eval()


def test_import_parity(torch_model):
    rng = np.random.default_rng(1)
    B, T = 3, 37
    feats = rng.standard_normal((B, T, MEL)).astype(np.float32)
    with torch.no_grad():
        want = torch_model(torch.from_numpy(feats)).numpy()

    params = import_torch_bilstm_ctc(torch_model.state_dict(),
                                     num_mel_bins=MEL, vocab_size=V)
    cfg = BiLSTMEncoderConfig(conv_channels=CONV, hidden_dim=H,
                              num_layers=LAYERS, dropout=0.0, use_pallas=False)
    enc_mod = BiLSTMEncoder(cfg)
    head = nn.Dense(V)
    lengths = jnp.full((B,), T, jnp.int32)
    enc, enc_len = enc_mod.apply({"params": params["encoder"]},
                                 jnp.asarray(feats), lengths)
    got = head.apply({"params": params["ctc_head"]}, enc)

    t_out = (T + 2 - 3) // 2 + 1
    t_out = (t_out + 2 - 3) // 2 + 1
    assert int(enc_len[0]) == t_out == want.shape[1]
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-5, rtol=1e-4)


def test_import_via_saved_checkpoint(tmp_path, torch_model):
    """Round-trip through torch.save, the reference's on-disk format."""
    from pytorch_asr_tpu.training.torch_import import load_torch_checkpoint

    path = tmp_path / "ref.pt"
    torch.save({"state_dict": torch_model.state_dict(), "step": 123}, path)
    sd = load_torch_checkpoint(str(path))
    params = import_torch_bilstm_ctc(sd, num_mel_bins=MEL, vocab_size=V)
    assert params["encoder"]["lstm0_fwd"]["wih"].shape[1] == 4 * H
    assert params["ctc_head"]["kernel"].shape == (2 * H, V)


def test_import_rejects_unidirectional(torch_model):
    sd = {k: v for k, v in torch_model.state_dict().items()
          if "_reverse" not in k}
    with pytest.raises(TorchImportError, match="unidirectional"):
        import_torch_bilstm_ctc(sd, num_mel_bins=MEL)


def test_import_rejects_wrong_vocab(torch_model):
    with pytest.raises(TorchImportError, match="vocab"):
        import_torch_bilstm_ctc(torch_model.state_dict(), num_mel_bins=MEL,
                                vocab_size=V + 1)


def test_trainer_init_from_torch(tmp_path, torch_model_charvocab):
    """CLI-level flow: train.py init_from_torch=<ckpt> seeds the TrainState."""
    torch_model = torch_model_charvocab
    import dataclasses

    from pytorch_asr_tpu.configs import get_config
    from pytorch_asr_tpu.configs.base import (
        DataConfig, FrontendConfig, ModelConfig, OptimConfig, TrainConfig)
    from pytorch_asr_tpu.data import BucketedDataset, synthetic_corpus
    from pytorch_asr_tpu.training.trainer import Trainer

    path = tmp_path / "ref.pt"
    torch.save(torch_model.state_dict(), path)

    cfg = dataclasses.replace(
        get_config("ctc_bilstm_dev1h"),
        frontend=FrontendConfig(n_mels=MEL, use_pallas=False,
                                specaugment=False),
        data=DataConfig(batch_size=2, bucket_audio_lens=(16000,),
                        bucket_label_lens=(24,), synthetic_num_utts=4),
        model=ModelConfig(
            encoder=BiLSTMEncoderConfig(conv_channels=CONV, hidden_dim=H,
                                        num_layers=LAYERS, dropout=0.0,
                                        use_pallas=False),
            compute_dtype="float32"),
        train=TrainConfig(optim=OptimConfig(total_steps=10)),
    )
    corpus = synthetic_corpus(4, cfg.frontend.sample_rate, seed=0,
                              min_words=1, max_words=2)
    ds = BucketedDataset(corpus, batch_size=2,
                         bucket_audio_lens=cfg.data.bucket_audio_lens,
                         bucket_label_lens=cfg.data.bucket_label_lens)
    trainer = Trainer(cfg, dataset=ds, enable_checkpoints=False,
                      init_from_torch=str(path))
    want = np.asarray(torch_model.lstm.weight_hh_l0.detach()).T
    got = np.asarray(trainer.state.params["encoder"]["lstm0_fwd"]["whh"])
    np.testing.assert_allclose(got, want, atol=1e-6)
    result = trainer.evaluate(max_batches=1)
    assert np.isfinite(result["wer"])


def test_trainer_init_from_torch_shape_mismatch(tmp_path, torch_model_charvocab):
    torch_model = torch_model_charvocab
    import dataclasses

    from pytorch_asr_tpu.configs import get_config
    from pytorch_asr_tpu.configs.base import (
        DataConfig, FrontendConfig, ModelConfig)
    from pytorch_asr_tpu.data import BucketedDataset, synthetic_corpus
    from pytorch_asr_tpu.training.trainer import Trainer

    path = tmp_path / "ref.pt"
    torch.save(torch_model.state_dict(), path)
    cfg = dataclasses.replace(
        get_config("ctc_bilstm_dev1h"),
        frontend=FrontendConfig(n_mels=MEL, use_pallas=False,
                                specaugment=False),
        data=DataConfig(batch_size=2, bucket_audio_lens=(16000,),
                        bucket_label_lens=(24,), synthetic_num_utts=4),
        model=ModelConfig(
            encoder=BiLSTMEncoderConfig(conv_channels=CONV,
                                        hidden_dim=H + 4,  # wrong
                                        num_layers=LAYERS, dropout=0.0,
                                        use_pallas=False),
            compute_dtype="float32"),
    )
    corpus = synthetic_corpus(4, cfg.frontend.sample_rate, seed=0,
                              min_words=1, max_words=2)
    ds = BucketedDataset(corpus, batch_size=2,
                         bucket_audio_lens=cfg.data.bucket_audio_lens,
                         bucket_label_lens=cfg.data.bucket_label_lens)
    with pytest.raises(TorchImportError, match="shapes"):
        Trainer(cfg, dataset=ds, enable_checkpoints=False,
                init_from_torch=str(path))
