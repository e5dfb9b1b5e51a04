"""Char n-gram LM for shallow fusion (SURVEY.md §2.1/§2.2 'KenLM binding' row).

The reference genre binds KenLM (C++) and queries it per-prefix from the host
decode loop.  TPU-native replacement: the backoff LM is *tensorized* once on
host into a dense conditional table P(c | ctx) over ALL length-(n-1) char
contexts, which lives in HBM and is queried by gather inside the batched beam
search -- no host round-trips (BASELINE north star: device-resident LM state).

For the char vocab (V=29) a dense 4-gram table is V^3 x V floats = 2.8 MB;
5-gram = 82 MB (still HBM-resident).  Context ids roll as
ctx' = (ctx * V + c) mod V^(n-1).

Also provides a minimal ARPA reader and a trainable CharNgramLM so tests and
the synthetic pipeline can build LMs from text without external tooling.
"""

from __future__ import annotations

import math
from collections import defaultdict

import numpy as np

from pytorch_asr_tpu.data.tokenizer import CharTokenizer

LOG10 = math.log(10.0)


class BackoffLM:
    """Katz-style backoff char LM: logprobs[ngram] (natural log) + backoffs."""

    def __init__(self, order: int, logprobs: dict[tuple, float],
                 backoffs: dict[tuple, float]) -> None:
        self.order = order
        self.logprobs = logprobs
        self.backoffs = backoffs

    def score(self, ctx: tuple, c: int) -> float:
        """log P(c | ctx) with backoff; ctx is a tuple of token ids."""
        ctx = tuple(ctx[-(self.order - 1):]) if self.order > 1 else ()
        backoff = 0.0
        while True:
            ng = ctx + (c,)
            if ng in self.logprobs:
                return self.logprobs[ng] + backoff
            if not ctx:
                return backoff + self.logprobs.get((c,), -20.0)
            backoff += self.backoffs.get(ctx, 0.0)
            ctx = ctx[1:]


def train_char_ngram(texts: list[str], order: int = 3,
                     tokenizer: CharTokenizer | None = None) -> BackoffLM:
    """Tiny add-k interpolated char LM from raw text (for tests/synthetic runs)."""
    tok = tokenizer or CharTokenizer()
    counts: list[dict] = [defaultdict(int) for _ in range(order + 1)]
    for text in texts:
        ids = [int(i) for i in tok.encode(text)]
        for i in range(len(ids)):
            for n in range(1, order + 1):
                if i + n <= len(ids):
                    counts[n][tuple(ids[i : i + n])] += 1
    V = tok.vocab_size
    logprobs: dict[tuple, float] = {}
    backoffs: dict[tuple, float] = {}
    k = 0.1
    total_uni = sum(counts[1].values())
    for n in range(1, order + 1):
        for ng, c in counts[n].items():
            if n == 1:
                logprobs[ng] = math.log((c + k) / (total_uni + k * V))
            else:
                ctx_count = counts[n - 1].get(ng[:-1], 0)
                logprobs[ng] = math.log((c + k) / (ctx_count + k * V))
    # uniform backoff weights (adequate for fusion tests)
    for n in range(1, order):
        for ng in counts[n]:
            backoffs[ng] = math.log(0.4)
    return BackoffLM(order, logprobs, backoffs)


def read_arpa(path: str, tokenizer: CharTokenizer | None = None) -> BackoffLM:
    """Minimal ARPA reader for char-token LMs (tokens are single characters,
    '<space>' for space; <s>/</s>/<unk> are skipped)."""
    tok = tokenizer or CharTokenizer()

    def to_id(sym: str) -> int | None:
        if sym in ("<s>", "</s>", "<unk>", "<UNK>"):
            return None
        ch = " " if sym == "<space>" else sym
        ids = tok.encode(ch)
        return int(ids[0]) if len(ids) == 1 else None

    logprobs: dict[tuple, float] = {}
    backoffs: dict[tuple, float] = {}
    order = 1
    cur_n = 0
    with open(path) as fh:
        for line in fh:
            line = line.strip()
            if not line or line.startswith("\\data\\") or line.startswith("ngram"):
                continue
            if line.startswith("\\") and "-grams:" in line:
                cur_n = int(line[1 : line.index("-")])
                order = max(order, cur_n)
                continue
            if line.startswith("\\end\\"):
                break
            parts = line.split("\t")
            if len(parts) < 2:
                parts = line.split()
                if len(parts) < cur_n + 1:
                    continue
                parts = [parts[0], " ".join(parts[1 : cur_n + 1])] + parts[cur_n + 1:]
            lp = float(parts[0]) * LOG10
            syms = parts[1].split()
            ids = [to_id(s) for s in syms]
            if any(i is None for i in ids):
                continue
            ng = tuple(ids)
            logprobs[ng] = lp
            if len(parts) >= 3:
                try:
                    backoffs[ng] = float(parts[2]) * LOG10
                except ValueError:
                    pass
    return BackoffLM(order, logprobs, backoffs)


def write_arpa(lm: BackoffLM, path: str,
               tokenizer: CharTokenizer | None = None) -> None:
    """Serialize a BackoffLM to ARPA (char symbols; ' ' written as <space>)."""
    tok = tokenizer or CharTokenizer()

    def sym(i: int) -> str:
        ch = tok.decode([i])
        return "<space>" if ch == " " else ch

    by_order: dict[int, list] = {}
    for ng, lp in lm.logprobs.items():
        by_order.setdefault(len(ng), []).append((ng, lp))
    with open(path, "w") as fh:
        fh.write("\\data\\\n")
        for n in sorted(by_order):
            fh.write(f"ngram {n}={len(by_order[n])}\n")
        fh.write("\n")
        for n in sorted(by_order):
            fh.write(f"\\{n}-grams:\n")
            for ng, lp in sorted(by_order[n]):
                cols = [f"{lp / LOG10:.6f}", " ".join(sym(i) for i in ng)]
                if ng in lm.backoffs:
                    cols.append(f"{lm.backoffs[ng] / LOG10:.6f}")
                fh.write("\t".join(cols) + "\n")
            fh.write("\n")
        fh.write("\\end\\\n")


def tensorize(lm: BackoffLM, tokenizer: CharTokenizer | None = None,
              order: int | None = None) -> np.ndarray:
    """Dense (V^(n-1), V) table of log P(c | ctx) with backoff fully applied.

    Row index encodes the context as base-V digits, oldest char most
    significant; contexts shorter than n-1 are encoded with leading 0s (blank
    id never appears in real prefixes, so 0 doubles as 'no history').
    """
    tok = tokenizer or CharTokenizer()
    V = tok.vocab_size
    n = order or lm.order
    n_ctx = V ** (n - 1)
    table = np.zeros((n_ctx, V), dtype=np.float32)
    ctx_syms = np.zeros((n_ctx, n - 1), dtype=np.int64)
    for pos in range(n - 1):
        ctx_syms[:, pos] = (np.arange(n_ctx) // V ** (n - 2 - pos)) % V
    for row in range(n_ctx):
        ctx = tuple(int(x) for x in ctx_syms[row] if x != 0)
        for c in range(V):
            table[row, c] = lm.score(ctx, c)
    return table


def roll_context(ctx, c, vocab_size: int, order: int):
    """Device-side context update: ctx' = (ctx*V + c) mod V^(n-1)."""
    return (ctx * vocab_size + c) % (vocab_size ** (order - 1))
