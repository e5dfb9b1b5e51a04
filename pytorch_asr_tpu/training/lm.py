"""RNN-LM training + (de)serialization (SURVEY.md §2.1 LM-fusion row).

The reference genre trains a char RNN LM on transcript text and fuses it at
decode time.  Here: a jitted adam loop over padded (sos+text -> text+eos)
batches, save/load as a single .npz (flattened param tree + config), loadable
by the decode driver for neural shallow fusion.
"""

from __future__ import annotations

import dataclasses
import json

import jax
import jax.numpy as jnp
import numpy as np
import optax

from pytorch_asr_tpu.data.tokenizer import CharTokenizer
from pytorch_asr_tpu.models.lm_rnn import CharRNNLM, RNNLMConfig


def lm_batches(texts: list[str], batch_size: int, max_len: int,
               tokenizer: CharTokenizer | None = None, seed: int = 0):
    """Infinite iterator of (inputs, targets, lengths) LM batches.

    inputs  = [sos, c1..cn]  (B, U)
    targets = [c1..cn, eos]  (B, U);  lengths = n + 1.
    """
    tok = tokenizer or CharTokenizer()
    enc = [tok.encode(t)[: max_len - 1] for t in texts if t.strip()]
    if not enc:
        raise ValueError("no non-empty training texts")
    rng = np.random.default_rng(seed)
    U = max_len
    while True:
        idx = rng.integers(0, len(enc), size=batch_size)
        inputs = np.zeros((batch_size, U), np.int32)
        targets = np.zeros((batch_size, U), np.int32)
        lengths = np.zeros((batch_size,), np.int32)
        for row, j in enumerate(idx):
            ids = enc[j]
            n = len(ids)
            inputs[row, 0] = tok.sos_id
            inputs[row, 1 : n + 1] = ids
            targets[row, :n] = ids
            targets[row, n] = tok.eos_id
            lengths[row] = n + 1
        yield inputs, targets, lengths


def make_lm_train_step(model: CharRNNLM, tx: optax.GradientTransformation):
    def loss_fn(params, inputs, targets, lengths):
        logits = model.apply({"params": params}, inputs)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
        mask = jnp.arange(inputs.shape[1])[None, :] < lengths[:, None]
        total = jnp.sum(nll * mask)
        count = jnp.maximum(jnp.sum(mask), 1)
        return total / count

    def train_step(params, opt_state, inputs, targets, lengths):
        loss, grads = jax.value_and_grad(loss_fn)(params, inputs, targets, lengths)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    return jax.jit(train_step)


def train_rnn_lm(texts: list[str], cfg: RNNLMConfig | None = None,
                 steps: int = 500, batch_size: int = 32, max_len: int = 128,
                 lr: float = 1e-3, seed: int = 0, log_every: int = 0,
                 tokenizer: CharTokenizer | None = None):
    """Train a char RNN LM on transcript texts.  Returns (model, params, nll)."""
    cfg = cfg or RNNLMConfig()
    tok = tokenizer or CharTokenizer()
    model = CharRNNLM(cfg, tok.vocab_size)
    it = lm_batches(texts, batch_size, max_len, tok, seed=seed)
    inputs, targets, lengths = next(it)
    params = model.init(jax.random.PRNGKey(seed), jnp.asarray(inputs))["params"]
    tx = optax.chain(optax.clip_by_global_norm(5.0), optax.adam(lr))
    opt_state = tx.init(params)
    step_fn = make_lm_train_step(model, tx)
    loss = jnp.inf
    for i in range(steps):
        params, opt_state, loss = step_fn(params, opt_state,
                                          jnp.asarray(inputs),
                                          jnp.asarray(targets),
                                          jnp.asarray(lengths))
        if log_every and (i + 1) % log_every == 0:
            print(json.dumps({"event": "lm_train", "step": i + 1,
                              "nll": float(loss),
                              "ppl": float(jnp.exp(loss))}))
        inputs, targets, lengths = next(it)
    return model, params, float(loss)


def save_rnn_lm(path: str, cfg: RNNLMConfig, params) -> None:
    """Serialize config + flattened param tree to one .npz file."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    arrays = {"/".join(str(getattr(k, "key", k)) for k in kp): np.asarray(v)
              for kp, v in flat}
    arrays["__config__"] = np.frombuffer(
        json.dumps(dataclasses.asdict(cfg)).encode(), dtype=np.uint8)
    np.savez(path, **arrays)


def load_rnn_lm(path: str, tokenizer: CharTokenizer | None = None):
    """Returns (model, params) from a save_rnn_lm .npz."""
    tok = tokenizer or CharTokenizer()
    data = np.load(path)
    cfg = RNNLMConfig(**json.loads(bytes(data["__config__"]).decode()))
    params: dict = {}
    for key in data.files:
        if key == "__config__":
            continue
        node = params
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(data[key])
    return CharRNNLM(cfg, tok.vocab_size), params
