"""Decoding driver (SURVEY.md layer L5'/T5, §3.2).

Batch loop over the eval set dispatching to the configured decoder
(prefix_beam | attention_beam | joint_beam); computes corpus WER/CER and
decode RTF.  Log-probs never leave the device until final token ids.
"""

from __future__ import annotations

import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from pytorch_asr_tpu.decoding.attention_beam import attention_beam_search
from pytorch_asr_tpu.decoding.lm import read_arpa, tensorize
from pytorch_asr_tpu.decoding.prefix_beam import prefix_beam_search


def _load_lm(cfg, tokenizer=None):
    """Load the fusion LM named by cfg.decode.lm_path.

    Returns (lm_table, rnn_lm, rnn_lm_params, hash_lm): ``.npz`` paths are
    RNN LMs saved by training.lm.save_rnn_lm; anything else is parsed as
    ARPA and compiled either to a dense device table (small vocabs) or to
    hashed backoff tables (BPE/large vocabs -- decoding/lm_hashed.py), per
    cfg.decode.lm_backend.
    """
    path = cfg.decode.lm_path
    if not path:
        return None, None, None, None
    if path.endswith(".npz"):
        from pytorch_asr_tpu.training.lm import load_rnn_lm

        rnn_lm, rnn_params = load_rnn_lm(path)
        return None, rnn_lm, rnn_params, None

    from pytorch_asr_tpu.data.tokenizer import CharTokenizer

    tok = tokenizer or CharTokenizer()
    backend = getattr(cfg.decode, "lm_backend", "auto")
    lm = read_arpa(path, tok)
    dense_floats = tok.vocab_size ** lm.order
    if backend == "dense" or (backend == "auto"
                              and dense_floats <= 64_000_000):
        from pytorch_asr_tpu import native

        if native.available() and isinstance(tok, CharTokenizer):
            table, _ = native.arpa_dense_table(path)
            return jnp.asarray(table), None, None, None
        return jnp.asarray(tensorize(lm, tok)), None, None, None
    from pytorch_asr_tpu.decoding.lm_hashed import build_hashed_lm

    return None, None, None, build_hashed_lm(lm, tok.vocab_size)


def _load_lm_table(cfg):
    return _load_lm(cfg)[0]


def make_decode_fn(trainer, lm_table=None, rnn_lm=None, rnn_lm_params=None,
                   hash_lm=None):
    """Builds a jitted (params, batch) -> (tokens, lengths) decode step.

    Outputs are pinned to the 'data' batch sharding so multi-host decode can
    fetch per-process addressable rows (see decoding/eval_metrics.py).
    """
    from jax.sharding import NamedSharding, PartitionSpec

    cfg = trainer.cfg
    model = trainer.model
    method = cfg.decode.method
    tok = trainer.tokenizer
    has_lm = (lm_table is not None or rnn_lm is not None
              or hash_lm is not None)
    out_sh = NamedSharding(trainer.mesh, PartitionSpec("data"))
    jit_rows = partial(jax.jit, out_shardings=(out_sh, out_sh))

    if method == "greedy":
        from pytorch_asr_tpu.decoding.greedy import greedy_ctc

        @jit_rows
        def decode_fn(params, batch):
            out = model.apply({"params": params}, batch["audio"],
                              batch["audio_len"], train=False)
            return greedy_ctc(out["ctc_logits"], out["enc_len"])

        return decode_fn

    if method == "prefix_beam":
        shard = (cfg.decode.shard_beams
                 and trainer.mesh.shape.get("model", 1) > 1)
        if shard:
            from pytorch_asr_tpu.decoding.prefix_beam_sharded import (
                prefix_beam_search_sharded)

            # prefix_beam_search_sharded jits its own shard_map
            def decode_fn(params, batch):
                out = jax.jit(lambda p, b: model.apply(
                    {"params": p}, b["audio"], b["audio_len"],
                    train=False))(params, batch)
                toks, lens, _ = prefix_beam_search_sharded(
                    out["ctc_logits"], out["enc_len"], trainer.mesh,
                    beam_size=cfg.decode.beam_size,
                    lm_table=lm_table,
                    lm_alpha=cfg.decode.lm_alpha if has_lm else 0.0,
                    lm_beta=cfg.decode.lm_beta if has_lm else 0.0,
                    max_len=cfg.decode.max_decode_len,
                    rnn_lm=rnn_lm, rnn_lm_params=rnn_lm_params,
                    sos_id=tok.sos_id, hash_lm=hash_lm)
                return toks, lens

            return decode_fn

        @jit_rows
        def decode_fn(params, batch):
            out = model.apply({"params": params}, batch["audio"],
                              batch["audio_len"], train=False)
            toks, lens, _ = prefix_beam_search(
                out["ctc_logits"], out["enc_len"],
                beam_size=cfg.decode.beam_size,
                lm_table=lm_table,
                lm_alpha=cfg.decode.lm_alpha if has_lm else 0.0,
                lm_beta=cfg.decode.lm_beta if has_lm else 0.0,
                max_len=cfg.decode.max_decode_len,
                rnn_lm=rnn_lm, rnn_lm_params=rnn_lm_params,
                sos_id=tok.sos_id, hash_lm=hash_lm,
                lm_top_k=getattr(cfg.decode, "lm_top_k", 0),
                ext_top_a=getattr(cfg.decode, "ext_top_a", 0))
            return toks, lens

        return decode_fn

    if method in ("attention_beam", "joint_beam"):
        ctc_weight = cfg.decode.joint_ctc_weight if method == "joint_beam" else 0.0

        @jit_rows
        def decode_fn(params, batch):
            out = model.apply({"params": params}, batch["audio"],
                              batch["audio_len"], train=False)
            toks, lens, _ = attention_beam_search(
                model, params, out["enc"], out["enc_len"],
                tok.sos_id, tok.eos_id,
                beam_size=cfg.decode.beam_size,
                max_len=cfg.decode.max_decode_len,
                length_norm=cfg.decode.length_norm,
                ctc_logits=out["ctc_logits"] if ctc_weight > 0 else None,
                ctc_weight=ctc_weight,
                lm_table=lm_table,
                lm_alpha=cfg.decode.lm_alpha if has_lm else 0.0,
                rnn_lm=rnn_lm, rnn_lm_params=rnn_lm_params,
                hash_lm=hash_lm,
                coverage_beta=cfg.decode.coverage_beta,
                coverage_tau=cfg.decode.coverage_tau)
            return toks, lens

        return decode_fn

    raise ValueError(f"unknown decode method {method!r}")


def decode_dataset(trainer, max_batches: int | None = None,
                   dump_path: str | None = None) -> dict:
    """Full-dataset decode with the configured method; returns metrics.

    Multi-host-safe (VERDICT r2 item 2): same pattern as Trainer.evaluate —
    identical eval batches on every process, per-process row contribution +
    addressable-shard fetch, count-sum reduction for the corpus metrics.

    ``dump_path``: optional output prefix; writes ``<prefix>.ref.tsv`` and
    ``<prefix>.hyp.tsv`` (``id<TAB>text`` lines), scoreable offline with
    ``python -m pytorch_asr_tpu.eval_wer <prefix>.ref.tsv <prefix>.hyp.tsv``.
    With multiple processes each writes its own rows to
    ``<prefix>.p<process_index>.{ref,hyp}.tsv``.
    """
    import jax as _jax

    from pytorch_asr_tpu.decoding.eval_metrics import (
        local_hyps_refs, reduce_decode_metrics)
    from pytorch_asr_tpu.parallel.mesh import shard_batch_global
    from pytorch_asr_tpu.training.state import eval_params

    cfg = trainer.cfg
    lm_table, rnn_lm, rnn_lm_params, hash_lm = _load_lm(cfg, trainer.tokenizer)
    decode_fn = make_decode_fn(trainer, lm_table, rnn_lm, rnn_lm_params,
                               hash_lm)
    tok = trainer.tokenizer
    eval_ds, pad_eff = _decode_dataset_with_ladder(trainer)
    refs, hyps = [], []
    audio_sec = 0.0
    t0 = time.perf_counter()
    for i, host_batch in enumerate(eval_ds.epoch_batches(seed=0)):
        if max_batches is not None and i >= max_batches:
            break
        batch = shard_batch_global(trainer.mesh, host_batch)
        toks, lens = decode_fn(eval_params(trainer.state), batch)
        r, h, a_sec = local_hyps_refs(tok, batch, toks, lens,
                                      cfg.frontend.sample_rate)
        refs.extend(r)
        hyps.extend(h)
        audio_sec += a_sec
    dt = time.perf_counter() - t0
    if dump_path:
        if _jax.process_count() > 1:
            dump_path = f"{dump_path}.p{_jax.process_index()}"
        for suffix, lines in ((".ref.tsv", refs), (".hyp.tsv", hyps)):
            with open(dump_path + suffix, "w") as fh:
                for i, text in enumerate(lines):
                    fh.write(f"utt{i:06d}\t{text}\n")
    result = {"method": cfg.decode.method,
              **reduce_decode_metrics(refs, hyps, audio_sec, dt),
              "step": int(trainer.state.step)}
    if pad_eff is not None:
        result["padding_efficiency_decode"] = pad_eff
    trainer.metrics.log("decode", **result)
    return result


def _decode_dataset_with_ladder(trainer):
    """Decode-side bucket ladder (SURVEY §7.3; VERDICT r4 item 8).

    Dev/test length profiles are longer-tailed than train, and decode
    batches never feed the train step, so the decode loop may use a much
    finer DP-optimal ladder (cfg.decode.auto_buckets, typically 12-16) at
    zero train-recompile cost -- only one decode-fn compile per bucket.
    Returns (dataset, padding_efficiency | None).
    """
    cfg = trainer.cfg
    n = int(getattr(cfg.decode, "auto_buckets", 0) or 0)
    base = trainer.eval_dataset
    if n <= 0:
        return base, None
    from pytorch_asr_tpu.data import (
        BucketedDataset, corpus_audio_lengths, corpus_transcripts)
    from pytorch_asr_tpu.data.bucket_opt import (
        optimize_buckets, padding_efficiency)

    corpus = base._corpus
    tok = trainer.tokenizer
    audio_lens = corpus_audio_lengths(corpus)
    label_lens = [len(tok.encode(t)) for t in corpus_transcripts(corpus)]
    audio_b, label_b = optimize_buckets(audio_lens, label_lens, n)
    ds = BucketedDataset(corpus, batch_size=base.batch_size,
                         bucket_audio_lens=audio_b,
                         bucket_label_lens=label_b, tokenizer=tok)
    return ds, padding_efficiency(audio_lens, audio_b)
