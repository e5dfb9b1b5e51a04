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


def train_char_ngram_kn(texts: list[str], order: int = 4,
                        tokenizer: CharTokenizer | None = None,
                        include_eos: bool = False) -> BackoffLM:
    """Interpolated modified Kneser-Ney char LM (Chen & Goodman 1998).

    This is the estimator KenLM implements -- the reference genre shells out
    to KenLM (C++) to build its shallow-fusion ARPA models; this builds them
    in-framework so no external tooling is needed.  Produces a standard
    backoff ARPA model: stored probabilities are the *interpolated* KN
    probabilities and backoff(ctx) = log gamma(ctx), so ``BackoffLM.score``
    / ``write_arpa`` / ``tensorize`` all apply unchanged.

    ``include_eos`` appends the tokenizer's eos id to every sentence so the
    attention-beam eos slot gets a trained probability (CTC prefix fusion
    never queries eos and can leave it off).
    """
    tok = tokenizer or CharTokenizer()
    V = tok.vocab_size

    # --- raw counts per order -------------------------------------------
    counts: list[dict] = [defaultdict(int) for _ in range(order + 1)]
    for text in texts:
        ids = [int(i) for i in tok.encode(text)]
        if include_eos:
            ids.append(tok.eos_id)
        for i in range(len(ids)):
            for n in range(1, order + 1):
                if i + n <= len(ids):
                    counts[n][tuple(ids[i : i + n])] += 1

    # --- continuation counts: lower orders count *types* of continuations
    # N1+(. ctx w) -- the KN insight that P(w | ctx) at backoff levels should
    # reflect how many distinct contexts w completes, not how often.
    cont: list[dict] = [defaultdict(int) for _ in range(order)]
    for n in range(2, order + 1):
        seen = counts[n]
        for ng in seen:
            cont[n - 1][ng[1:]] += 1          # distinct left-extensions

    def eff_counts(n: int) -> dict:
        """Counts the order-n estimator runs on: raw at the top, continuation
        below (unigram included)."""
        return counts[n] if n == order else cont[n]

    # --- modified KN discounts per order from count-of-counts ------------
    def discounts(n: int) -> tuple[float, float, float]:
        cc = defaultdict(int)
        for _, c in eff_counts(n).items():
            if c <= 4:
                cc[c] += 1
        n1, n2, n3, n4 = (max(cc[i], 1) for i in (1, 2, 3, 4))
        y = n1 / (n1 + 2.0 * n2)
        d1 = max(1.0 - 2.0 * y * n2 / n1, 0.0)
        d2 = max(2.0 - 3.0 * y * n3 / n2, 0.0)
        d3 = max(3.0 - 4.0 * y * n4 / n3, 0.0)
        return d1, d2, d3

    logprobs: dict[tuple, float] = {}
    backoffs: dict[tuple, float] = {}

    # --- unigram level: continuation probability interpolated with uniform
    uni = eff_counts(1)
    total1 = sum(uni.values()) or 1
    d1u, d2u, d3u = discounts(1)

    def dfor(c: int, d: tuple) -> float:
        return d[0] if c == 1 else (d[1] if c == 2 else d[2])

    n_types = [0.0, 0.0, 0.0]
    for c in uni.values():
        n_types[min(c, 3) - 1] += 1
    gamma_uni = (d1u * n_types[0] + d2u * n_types[1] + d3u * n_types[2]) / total1
    p_uni = {w: 0.0 for w in range(V)}
    for (w,), c in uni.items():
        p_uni[w] = max(c - dfor(c, (d1u, d2u, d3u)), 0.0) / total1
    for w in range(V):
        p_uni[w] += gamma_uni / V
        # floor so every char keeps nonzero mass even with gamma ~ 0
        p_uni[w] = max(p_uni[w], 1e-10)
    z = sum(p_uni.values())
    p_interp_prev = {(w,): p / z for w, p in p_uni.items()}
    for ng, p in p_interp_prev.items():
        logprobs[ng] = math.log(p)

    # --- higher orders: absolute discounting + interpolation --------------
    for n in range(2, order + 1):
        eff = eff_counts(n)
        d = discounts(n)
        # per-context totals and type counts N_i(ctx .)
        ctx_total: dict[tuple, int] = defaultdict(int)
        ctx_types: dict[tuple, list] = defaultdict(lambda: [0, 0, 0])
        for ng, c in eff.items():
            ctx_total[ng[:-1]] += c
            ctx_types[ng[:-1]][min(c, 3) - 1] += 1
        p_interp: dict[tuple, float] = {}
        for ctx, tot in ctx_total.items():
            t1, t2, t3 = ctx_types[ctx]
            gamma = (d[0] * t1 + d[1] * t2 + d[2] * t3) / tot
            backoffs[ctx] = math.log(max(gamma, 1e-10))
        for ng, c in eff.items():
            ctx = ng[:-1]
            lower = p_interp_prev.get(ng[1:])
            if lower is None:
                lower = math.exp(logprobs.get((ng[-1],), math.log(1e-10)))
            p = (max(c - dfor(c, d), 0.0) / ctx_total[ctx]
                 + math.exp(backoffs[ctx]) * lower)
            p_interp[ng] = p
            logprobs[ng] = math.log(max(p, 1e-12))
        p_interp_prev = p_interp

    return BackoffLM(order, logprobs, backoffs)


def perplexity(lm: BackoffLM, texts: list[str],
               tokenizer: CharTokenizer | None = None) -> float:
    """Per-char perplexity of ``texts`` under ``lm`` (host-side, eval only)."""
    tok = tokenizer or CharTokenizer()
    total, n_tok = 0.0, 0
    for text in texts:
        ids = [int(i) for i in tok.encode(text)]
        for i, c in enumerate(ids):
            ctx = tuple(ids[max(0, i - (lm.order - 1)) : i])
            total += lm.score(ctx, c)
            n_tok += 1
    return math.exp(-total / max(n_tok, 1))


def read_arpa(path: str, tokenizer: CharTokenizer | None = None) -> BackoffLM:
    """Minimal ARPA reader for char-token LMs (tokens are single characters,
    '<space>' for space; <s>/</s>/<unk> are skipped)."""
    tok = tokenizer or CharTokenizer()

    def to_id(sym: str) -> int | None:
        # Standard ARPA specials: <s> scores as our sos id, </s> as eos (the
        # attention-beam eos slot), <blank> is this framework's CTC blank.
        if sym == "<s>":
            return tok.sos_id
        if sym == "</s>":
            return tok.eos_id
        if sym == "<blank>":
            return tok.blank_id
        if sym in ("<unk>", "<UNK>"):
            return None
        # BPE tokenizers: ARPA symbols are whole pieces (id = index + 1).
        piece_map = getattr(tok, "_piece_to_id", None)
        if piece_map is not None:
            return piece_map.get(sym)
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
        if i == tok.sos_id:
            return "<s>"
        if i == tok.eos_id:
            return "</s>"
        if i == tok.blank_id:
            return "<blank>"
        pieces = getattr(tok, "pieces", None)
        if pieces is not None and 1 <= i <= len(pieces):
            return pieces[i - 1]
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
