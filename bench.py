"""Headline benchmark: CTC conv+BiLSTM training throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": "train_audio_seconds_per_sec_per_chip", "value": N,
   "unit": "audio_s/s/chip", "vs_baseline": N}

vs_baseline: the reference repo publishes no numbers (BASELINE.json:13
"published": {}), so the denominator is a literature-anchored estimate of a
2018-2021 PyTorch DS2-class trainer on one V100-class GPU: ~50 audio-seconds
of speech consumed per wall-second (deepspeech.pytorch-era epoch timings on
LibriSpeech 960h).  BASELINE.json:5 targets >= 3x that per chip, i.e.
vs_baseline >= 3.0.  Replace with measured numbers if /root/reference appears.

Run: plain `python bench.py` from /root/repo (axon TPU active).
"""

from __future__ import annotations

import dataclasses
import json
import time

import numpy as np

BASELINE_AUDIO_S_PER_S = 50.0   # literature anchor, see module docstring

import os

BATCH = int(os.environ.get("ASR_BENCH_BATCH", "128"))  # best measured point
                                                       # (64: ~45k, 128: ~55.7k)
AUDIO_SEC = 10.0
SAMPLE_RATE = 16000
WARMUP_STEPS = 3
MEASURE_STEPS = 20


def build():
    import jax

    from pytorch_asr_tpu.configs import get_config
    from pytorch_asr_tpu.configs.base import DataConfig, FrontendConfig
    from pytorch_asr_tpu.parallel.mesh import make_mesh, shard_batch, shard_params
    from pytorch_asr_tpu.training.state import (
        build_model, init_train_state, make_train_step)

    A = int(AUDIO_SEC * SAMPLE_RATE)
    L = 256
    cfg = get_config("ctc_bilstm_dev1h")
    cfg = dataclasses.replace(
        cfg,
        frontend=FrontendConfig(use_pallas=jax.default_backend() == "tpu"),
        data=DataConfig(batch_size=BATCH, bucket_audio_lens=(A,),
                        bucket_label_lens=(L,)),
    )
    rng = np.random.default_rng(0)
    host_batch = {
        "audio": (rng.standard_normal((BATCH, A)) * 0.1).astype(np.float32),
        "audio_len": np.full((BATCH,), A, np.int32),
        "tokens": rng.integers(1, 28, size=(BATCH, L)).astype(np.int32),
        "token_len": np.full((BATCH,), 200, np.int32),
    }
    mesh = make_mesh(cfg.mesh, batch_size=BATCH)
    model = build_model(cfg)
    state = init_train_state(cfg, model, host_batch)
    state = state.replace(params=shard_params(mesh, state.params),
                          opt_state=shard_params(mesh, state.opt_state))
    batch = shard_batch(mesh, host_batch)
    train_step = make_train_step(cfg, model)

    # K steps inside one jit: one host round-trip per K steps, matching the
    # trainer's async-dispatch pattern (host only syncs at log intervals).
    # The remote-tunnel RTT here is ~30 ms, so per-step host loops measure the
    # network, not the chip.
    def multi_step(state, batch):
        def body(_, s):
            s, aux = train_step(s, batch)
            return s
        state = jax.lax.fori_loop(0, MEASURE_STEPS, body, state)
        _, aux = train_step(state, batch)
        return state, aux

    step_fn = jax.jit(multi_step, donate_argnums=0)
    return state, batch, step_fn, mesh


def pipeline_bench(measure_steps: int = 20):
    """Real-input-stream throughput: bucketed variable-length batches pulled
    through the grain iterator (VERDICT r1 item 7 / SURVEY.md:369).

    Returns (audio_s_per_s_per_chip, padding_efficiency, phases) where padding
    efficiency = valid audio-s / padded bucket capacity audio-s -- the
    quantity bucket design trades against recompiles.  The host pipeline
    (tokenize, bucket, pad, H2D) is INSIDE the measured loop.

    ``phases`` (VERDICT r3 item 2) decomposes the same work UNOVERLAPPED:
      file_decode_s     corpus item access (file IO + WAV decode)
      tokenize_pad_s    producer residue (tokenize, bucket, pad copies)
      h2d_s             host->device transfer of the produced batches
      device_s          train-step compute on device-resident batches
      overlapped_s      the production loop (prefetch thread + async dispatch)
      overlap_ratio     device_s+h2d_s over overlapped_s (1.0 = host pipeline
                        fully hidden behind device work)
    """
    import jax

    from pytorch_asr_tpu.configs import get_config
    from pytorch_asr_tpu.configs.base import DataConfig, FrontendConfig
    from pytorch_asr_tpu.data import synthetic_corpus
    from pytorch_asr_tpu.data.grain_pipeline import GrainBucketedIterator
    from pytorch_asr_tpu.parallel.mesh import make_mesh, shard_batch, shard_params
    from pytorch_asr_tpu.training.state import (
        build_model, init_train_state, make_train_step)

    B = int(os.environ.get("ASR_BENCH_PIPE_BATCH", "64"))
    # LibriSpeech-like duration mix: most utterances 3-14 s — materialized as
    # a WAV tree and read back through the PRODUCTION lazy file-backed path
    # (load_corpus -> LazyCorpus -> per-item decode in the prefetch thread),
    # so the measured host pipeline includes real file IO + decode.
    import tempfile

    from pytorch_asr_tpu.data.librispeech import load_corpus
    from pytorch_asr_tpu.data.synthetic import materialize_wav_tree

    mem_corpus = synthetic_corpus(256, SAMPLE_RATE, seed=0,
                                  min_sec=3.0, max_sec=13.0)
    tree = tempfile.mkdtemp(prefix="asr_bench_wav_")
    materialize_wav_tree(mem_corpus, tree, split="dev-clean",
                         sample_rate=SAMPLE_RATE)
    corpus = load_corpus(tree, "dev-clean")
    # Bucket ladder from the corpus length profile (data/bucket_opt.py, the
    # data.auto_buckets production path): DP-minimal padding waste at a fixed
    # compile budget (each bucket is one XLA compilation).  Lengths come from
    # headers only (no decode).
    from pytorch_asr_tpu.data.bucket_opt import optimize_buckets

    # Default K=6: the bucket-ladder study (scripts/bucket_ladder_study.py)
    # puts the train profile at 0.92 padding efficiency there, vs 0.85 at
    # K=3; each extra bucket costs one more ~30 s XLA compile, amortized
    # once per run.
    n_buckets = int(os.environ.get("ASR_BENCH_PIPE_BUCKETS", "6"))
    buckets_a, buckets_l = optimize_buckets(
        [int(n) for n in corpus.audio_lengths()],
        [len(corpus.transcript(i)) for i in range(len(corpus))], n_buckets)
    cfg = get_config("ctc_bilstm_dev1h")
    cfg = dataclasses.replace(
        cfg,
        frontend=FrontendConfig(use_pallas=jax.default_backend() == "tpu"),
        data=DataConfig(batch_size=B, bucket_audio_lens=buckets_a,
                        bucket_label_lens=buckets_l),
    )
    mesh = make_mesh(cfg.mesh, batch_size=B)

    # ---- unoverlapped phase decomposition (VERDICT r3 item 2) -------------
    # A manual single-threaded reproduction of the producer (same tokenize /
    # assign_bucket / _emit functions as data.grain_pipeline) so decode and
    # tokenize+pad attribute EXACTLY: the production grain path decodes in
    # a 16-thread readahead pool, which makes per-phase wall times there
    # unattributable (GIL waits + out-of-window readahead).
    from pytorch_asr_tpu.data.batching import _emit, assign_bucket, make_buckets
    from pytorch_asr_tpu.data.tokenizer import CharTokenizer

    tokz = CharTokenizer()
    bucket_shapes = make_buckets(buckets_a, buckets_l)
    buffers = [[] for _ in bucket_shapes]
    host_batches = []
    file_decode_s = 0.0
    tokenize_pad_s = 0.0
    i = 0
    while len(host_batches) < measure_steps:
        t0 = time.perf_counter()
        audio, text = corpus[i % len(corpus)]
        i += 1
        file_decode_s += time.perf_counter() - t0
        t0 = time.perf_counter()
        toks = tokz.encode(str(text))
        bi = assign_bucket(bucket_shapes, len(audio), len(toks))
        if bi is not None:
            buffers[bi].append((np.asarray(audio, np.float32), toks))
            if len(buffers[bi]) == B:
                host_batches.append(_emit(buffers[bi], bucket_shapes[bi], B))
                buffers[bi] = []
        tokenize_pad_s += time.perf_counter() - t0

    first = host_batches[0]
    model = build_model(cfg)
    state = init_train_state(cfg, model, first)
    state = state.replace(params=shard_params(mesh, state.params),
                          opt_state=shard_params(mesh, state.opt_state))
    step_fn = jax.jit(make_train_step(cfg, model))

    # Warm every bucket shape's compile out of the measurement (synthetic
    # batches for ladder rungs the decomposition stream didn't hit).  Two
    # passes with the state THREADED through: the second pass warms the
    # (jit-output state signature x shape) entries the measured loops hit --
    # without it each measured step recompiles (~10 s/step observed).
    warm = {}
    for bk in bucket_shapes:
        A, Lb = bk.audio_len, bk.label_len
        if A in warm:
            continue
        wb = next((b for b in host_batches if b["audio"].shape[1] == A), None)
        if wb is None:
            wb = {"audio": np.zeros((B, A), np.float32),
                  "audio_len": np.full((B,), A, np.int32),
                  "tokens": np.ones((B, Lb), np.int32),
                  "token_len": np.full((B,), max(1, Lb // 2), np.int32)}
        warm[A] = wb
    for wb in list(warm.values()) * 2:
        state, aux = step_fn(state, shard_batch(mesh, wb))
        float(aux["loss"])                    # force the compile to finish

    t0 = time.perf_counter()
    dev_batches = [shard_batch(mesh, hb) for hb in host_batches]
    # block_until_ready resolves optimistically through the tunnel; a real
    # on-device read is the only true barrier for the transfers.
    float(sum(db["audio"].sum() for db in dev_batches))
    h2d_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    for db in dev_batches:
        state, aux = step_fn(state, db)
    loss = float(aux["loss"])                  # serialize the chain
    device_s = time.perf_counter() - t0
    assert np.isfinite(loss)
    del dev_batches, host_batches

    # ---- overlapped production loop (prefetch=3, the trainer's config) ----
    # Starts with the prefetch queue cold; the producer thread races the
    # device loop from batch one.
    it = GrainBucketedIterator(corpus, batch_size=B,
                               bucket_audio_lens=buckets_a,
                               bucket_label_lens=buckets_l, seed=0,
                               prefetch=3)
    valid_s = 0.0
    padded_s = 0.0
    t0 = time.perf_counter()
    for _ in range(measure_steps):
        hb = next(it)                          # host pipeline INSIDE the loop
        valid_s += float(hb["audio_len"].sum()) / SAMPLE_RATE
        padded_s += hb["audio"].shape[0] * hb["audio"].shape[1] / SAMPLE_RATE
        state, aux = step_fn(state, shard_batch(mesh, hb))
    loss = float(aux["loss"])                  # serialize against execution
    dt = time.perf_counter() - t0
    assert np.isfinite(loss)
    it.close()
    chips = mesh.devices.size
    phases = {
        "file_decode_s": round(file_decode_s, 3),
        "tokenize_pad_s": round(tokenize_pad_s, 3),
        "h2d_s": round(h2d_s, 3),
        "device_s": round(device_s, 3),
        "overlapped_s": round(dt, 3),
        "overlap_ratio": round(min(1.0, (device_s + h2d_s) / dt), 3),
    }
    # Decode-side ladder (round 5, decode.auto_buckets=14 in the canonical
    # configs): decode batches never feed the train step, so the decode loop
    # may use a much finer DP-optimal ladder -- report the padding
    # efficiency the shipped driver logic achieves on this corpus profile.
    from pytorch_asr_tpu.data.bucket_opt import padding_efficiency

    lens_all = [int(n) for n in corpus.audio_lengths()]
    dec_a, _ = optimize_buckets(
        lens_all, [len(corpus.transcript(i)) for i in range(len(corpus))],
        14)
    phases["padding_efficiency_decode_k14"] = round(
        padding_efficiency(lens_all, dec_a), 4)
    return valid_s / dt / chips, valid_s / padded_s, phases


def run_tpu_parity() -> int | None:
    """Run the on-hardware parity suite IN-PROCESS (the chip is single-owner:
    a pytest subprocess would deadlock against this process's TPU client).
    Returns tests passed, or None off-TPU / on any harness fault."""
    import jax

    if jax.default_backend() != "tpu":
        return None
    try:
        import pytest

        os.environ["ASR_TPU_TESTS"] = "1"

        class _Count:
            passed = failed = 0

            def pytest_runtest_logreport(self, report):
                if report.when == "call":
                    if report.passed:
                        _Count.passed += 1
                    elif report.failed:
                        _Count.failed += 1

        suite = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "tests", "test_tpu_parity.py")
        rc = pytest.main([suite, "-q", "--no-header",
                          "-p", "no:cacheprovider"], plugins=[_Count()])
        if rc != 0 or _Count.failed:
            return -_Count.failed or -1          # negative = failures
        return _Count.passed
    except Exception as e:
        print(f"tpu parity harness fault: {e!r}", flush=True)
        return None


def main() -> None:
    import jax

    state, batch, step_fn, mesh = build()
    # Warmup absorbs both compiles (the second fires when donated outputs
    # re-enter with committed shardings).  Fetch the loss VALUE: through the
    # remote-TPU tunnel block_until_ready returns optimistically, so only a
    # real D2H read serializes against execution.
    for _ in range(WARMUP_STEPS):
        state, aux = step_fn(state, batch)
        float(aux["loss"])

    # Median of N alternated repetitions (VERDICT r3 item 3): each repetition
    # is MEASURE_STEPS+1 steps inside one jit; the median absorbs the ±% the
    # tunnel adds to any single repetition.
    reps = int(os.environ.get("ASR_BENCH_REPS", "5"))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        state, aux = step_fn(state, batch)
        loss = float(aux["loss"])
        times.append(time.perf_counter() - t0)
        assert np.isfinite(loss)
    dt = float(np.median(times))

    chips = mesh.devices.size
    audio_sec = (MEASURE_STEPS + 1) * BATCH * AUDIO_SEC
    value = audio_sec / dt / chips

    out = {
        "metric": "train_audio_seconds_per_sec_per_chip",
        "value": round(value, 2),
        "unit": "audio_s/s/chip",
        "vs_baseline": round(value / BASELINE_AUDIO_S_PER_S, 3),
        "headline_spread": [round(audio_sec / t / chips, 0) for t in times],
    }
    # Print the headline NOW: if the driver's timeout (or a tunnel hiccup)
    # cuts the pipeline phase short, the last complete line still carries
    # the contract metric.
    print(json.dumps(out), flush=True)
    if os.environ.get("ASR_BENCH_PIPELINE", "1") == "1":
        # Real-input-stream mode: grain iterator + bucketed variable lengths
        # + host pipeline inside the loop; padding efficiency alongside.
        try:
            pipe_value, pad_eff, phases = pipeline_bench()
            out["pipeline_audio_s_per_s_per_chip"] = round(pipe_value, 2)
            out["padding_efficiency"] = round(pad_eff, 4)
            out["pipeline_phases"] = phases
            # In this environment host->device batches traverse the remote
            # axon tunnel, so the pipeline number is a tunnel-bandwidth lower
            # bound, NOT a chip/host measure; padding_efficiency (valid
            # audio-s / padded bucket capacity) is environment-independent.
            # The phases quantify it: h2d_s dominates everything else
            # combined by >10x, while device compute is <2% of the loop --
            # on-host H2D (~GB/s DMA vs the tunnel's ~40 MB/s) would make
            # the same loop produce-bound at roughly
            # valid_s / (file_decode_s + tokenize_pad_s) audio-s/s.
            out["pipeline_note"] = ("H2D via remote tunnel; lower bound "
                                    "(see pipeline_phases: h2d-bound here)")
            print(json.dumps(out), flush=True)
        except Exception as e:  # never lose the headline to a pipeline fault
            print(f"pipeline bench failed: {e!r}", flush=True)
            print(json.dumps(out), flush=True)   # keep a JSON line last
    if os.environ.get("ASR_BENCH_TPU_PARITY", "1") == "1":
        # On-hardware kernel parity (VERDICT r3 item 8): certify the
        # hardware-only hazards (OOB undefined bits, Mosaic compile pins)
        # in every round's artifact, not just when someone remembers.
        n = run_tpu_parity()
        if n is not None:
            out["tpu_parity_passed"] = n
            print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
