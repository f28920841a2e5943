"""Beam decoding for the narrator: stochastic beam sample and diverse
group beam search.

Parity targets: the reference's ``beam_sample`` (stochastic candidate
draws + HF BeamSearchScorer, reference narrator.py:149-241) and
``group_beam_search`` (diverse beam groups, reference narrator.py:243-366).

TPU split of labour: every decoder forward is a jitted single-token
cached step (the heavy part — the reference re-forwards the whole prefix
per step); beam bookkeeping (tiny: scores, indices, hypothesis heaps)
runs host-side in numpy. The KV cache is gathered along the beam axis on
device between steps.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from lavila_tpu.models import sampling as S
from lavila_tpu.models.gpt2 import init_cache


class _Hypotheses:
    """Per-sample pool of finished hypotheses with length penalty
    (HF BeamHypotheses semantics)."""

    def __init__(self, num_beams: int, length_penalty: float):
        self.num_beams = num_beams
        self.length_penalty = length_penalty
        self.items: list[tuple[float, np.ndarray]] = []
        self.worst = 1e9

    def add(self, tokens: np.ndarray, sum_logprob: float):
        score = sum_logprob / max(len(tokens), 1) ** self.length_penalty
        if len(self.items) < self.num_beams or score > self.worst:
            self.items.append((score, tokens))
            if len(self.items) > self.num_beams:
                self.items.sort(key=lambda t: t[0])
                self.items.pop(0)
            self.worst = min(s for s, _ in self.items)

    def is_done(self, best_possible: float, cur_len: int) -> bool:
        if len(self.items) < self.num_beams:
            return False
        return self.worst >= best_possible / (cur_len ** self.length_penalty)


@dataclasses.dataclass
class BeamDecoder:
    """Beam decoding over a VCLM model with a cached jitted step.

    ``select_fn`` contract (per step): given per-beam next-token
    log-probs (B, V) and flat beam scores (B,), return a list of groups
    ``(slots, cand_scores, cand_tokens, cand_beams)`` — slots are the
    beam positions (within each batch item) the group refills; the cand
    arrays are (batch, 2*len(slots)) ranked best-first.
    """

    model: "object"             # VCLM module
    params: dict
    bos_id: int
    eos_id: int
    pad_id: int = 0
    max_text_length: int = 77

    def __post_init__(self):
        model = self.model

        def _prepare(params, image_tokens):
            return model.apply(params, image_tokens,
                               method="prepare_decode")

        def _step(params, tokens, cross_kv, cache, i):
            return model.apply(params, tokens, cross_kv, cache, i,
                               method="decode_step")

        self._prepare = jax.jit(_prepare)
        self._step = jax.jit(_step)

    # ------------------------------------------------------------------
    def _run(self, image_tokens, num_beams, select_fn, length_penalty,
             num_return_sequences, init_beam_scores):
        batch = image_tokens.shape[0]
        B = batch * num_beams
        image_rep = jnp.repeat(image_tokens, num_beams, axis=0)
        cross_kv = self._prepare(self.params, image_rep)
        # cache in the model's compute dtype — a f32 cache under --bf16
        # would silently double the per-step decode stream
        cache = init_cache(self.model.text_decoder.cfg, B,
                           self.max_text_length,
                           dtype=getattr(self.model, "dtype", jnp.float32))

        ids = np.full((B, 1), self.bos_id, np.int64)
        beam_scores = np.tile(init_beam_scores[None], (batch, 1)).reshape(-1)
        hyps = [_Hypotheses(num_beams, length_penalty) for _ in range(batch)]
        done = np.zeros(batch, bool)

        cur = jnp.full((B, 1), self.bos_id, jnp.int32)
        for i in range(self.max_text_length - 1):
            logits, cache = self._step(self.params, cur, cross_kv, cache, i)
            logp = np.asarray(jax.nn.log_softmax(
                logits.astype(jnp.float32), axis=-1))

            groups = select_fn(logp, beam_scores)

            next_scores = np.array(beam_scores)
            next_tokens = np.full(B, self.pad_id, np.int64)
            next_beams = np.arange(B, dtype=np.int64)
            best_possible = np.full(batch, -np.inf)
            for slots, cand_scores, cand_tokens, cand_beams in groups:
                for b in range(batch):
                    best_possible[b] = max(best_possible[b],
                                           float(cand_scores[b].max()))
                    if done[b]:
                        for s in slots:
                            next_tokens[b * num_beams + s] = self.pad_id
                            next_scores[b * num_beams + s] = 0.0
                        continue
                    k = 0
                    for score, tok, beam in zip(cand_scores[b],
                                                cand_tokens[b],
                                                cand_beams[b]):
                        src = b * num_beams + beam
                        if tok == self.eos_id:
                            # only candidates from the top slots spawn hyps
                            if k < len(slots):
                                hyps[b].add(ids[src, 1:].copy(),
                                            float(score))
                            continue
                        slot = b * num_beams + slots[k]
                        next_scores[slot] = score
                        next_tokens[slot] = tok
                        next_beams[slot] = src
                        k += 1
                        if k == len(slots):
                            break
            for b in range(batch):
                if not done[b]:
                    done[b] = hyps[b].is_done(best_possible[b], i + 1)

            beam_scores = next_scores
            ids = np.concatenate([ids[next_beams], next_tokens[:, None]],
                                 axis=1)
            reorder = jnp.asarray(next_beams)
            cache = jax.tree.map(lambda x: x[reorder], cache)
            cur = jnp.asarray(next_tokens[:, None], jnp.int32)
            if done.all():
                break

        # finalize: flush unfinished beams
        for b in range(batch):
            if done[b]:
                continue
            for j in range(num_beams):
                src = b * num_beams + j
                hyps[b].add(ids[src, 1:].copy(), float(beam_scores[src]))

        n_ret = num_return_sequences
        out = np.full((batch * n_ret, self.max_text_length), self.pad_id,
                      np.int64)
        out_scores = np.zeros(batch * n_ret, np.float32)
        for b in range(batch):
            ranked = sorted(hyps[b].items, key=lambda t: -t[0])[:n_ret]
            while len(ranked) < n_ret and ranked:
                ranked.append(ranked[-1])
            for j, (score, toks) in enumerate(ranked):
                row = b * n_ret + j
                seq = np.concatenate([[self.bos_id], toks])
                seq = seq[:self.max_text_length]
                out[row, :len(seq)] = seq
                if len(seq) < self.max_text_length:
                    out[row, len(seq)] = self.eos_id
                out_scores[row] = score
        return out, out_scores

    # ------------------------------------------------------------------
    def beam_sample(self, image_tokens, *, rng: np.random.Generator,
                    num_beams: int = 3, num_return_sequences: int = 1,
                    temperature: float = 1.0, top_k: Optional[int] = None,
                    top_p: Optional[float] = None,
                    length_penalty: float = 1.0):
        """Stochastic beam search: draw 2·num_beams candidates by sampling
        the warped joint (beam+token) distribution, rank by joint score
        (reference narrator.py:179-227).

        ``num_return_sequences > 1`` runs nrs INDEPENDENT beam sets per
        sample — the reference builds BeamSearchScorer(batch_size=
        batch·nrs, narrator.py:167-176) and takes one hypothesis from
        each set, which gives more diverse returns than the top-n of a
        single pool (group_beam_search is the single-pool/top-n mode,
        reference narrator.py:262-264)."""
        if num_return_sequences > 1:
            # interleaved repeat keeps the output row order
            # (b0r0, b0r1, ..., b1r0, ...) = the reference's
            # expanded_return_idx layout (narrator.py:157-160)
            image_tokens = jnp.repeat(image_tokens, num_return_sequences,
                                      axis=0)
        slots = np.arange(num_beams)

        def select(logp, beam_scores):
            batch = logp.shape[0] // num_beams
            V = logp.shape[-1]
            scores = logp + beam_scores[:, None]
            warped = np.asarray(S.warp_logits(
                jnp.asarray(scores), temperature, top_k, top_p,
                min_tokens_to_keep=2))
            flat = warped.reshape(batch, num_beams * V)
            orig = scores.reshape(batch, num_beams * V)
            cs = np.zeros((batch, 2 * num_beams), np.float32)
            ct = np.zeros((batch, 2 * num_beams), np.int64)
            cb = np.zeros((batch, 2 * num_beams), np.int64)
            for b in range(batch):
                p = np.exp(flat[b] - flat[b].max())
                p = p / p.sum()
                picks = rng.choice(len(p), size=2 * num_beams,
                                   replace=False, p=p)
                order = np.argsort(-orig[b, picks])
                picks = picks[order]
                cs[b] = orig[b, picks]
                ct[b] = picks % V
                cb[b] = picks // V
            return [(slots, cs, ct, cb)]

        # reference beam_sample starts ALL beams at score 0 (identical
        # prefixes diverge through the stochastic draws, narrator.py:174)
        init = np.zeros(num_beams, np.float32)
        return self._run(image_tokens, num_beams, select, length_penalty,
                         1, init)

    def beam_search(self, image_tokens, *, num_beams: int = 3,
                    num_return_sequences: int = 1,
                    length_penalty: float = 1.0):
        """Deterministic beam search (top-2k joint scores)."""
        slots = np.arange(num_beams)

        def select(logp, beam_scores):
            batch = logp.shape[0] // num_beams
            V = logp.shape[-1]
            flat = (logp + beam_scores[:, None]).reshape(batch,
                                                         num_beams * V)
            picks = np.argsort(-flat, axis=-1)[:, :2 * num_beams]
            rows = np.arange(batch)[:, None]
            return [(slots, flat[rows, picks], picks % V, picks // V)]

        init = np.full(num_beams, -1e9, np.float32)
        init[0] = 0.0
        return self._run(image_tokens, num_beams, select, length_penalty,
                         num_return_sequences, init)

    def group_beam_search(self, image_tokens, *, num_beams: int = 6,
                          num_beam_groups: int = 3,
                          num_return_sequences: int = 1,
                          temperature: float = 1.0,
                          top_k: Optional[int] = None,
                          top_p: Optional[float] = None,
                          length_penalty: float = 1.0):
        """Diverse beam search: independent top-2g selection per group
        (reference narrator.py:281-351)."""
        assert num_beams % num_beam_groups == 0
        g = num_beams // num_beam_groups

        def select(logp, beam_scores):
            batch = logp.shape[0] // num_beams
            V = logp.shape[-1]
            scores = logp + beam_scores[:, None]
            warped = np.asarray(S.warp_logits(
                jnp.asarray(scores), temperature, top_k, top_p,
                min_tokens_to_keep=2))
            groups = []
            for grp in range(num_beam_groups):
                slots = np.arange(grp * g, (grp + 1) * g)
                cs = np.zeros((batch, 2 * g), np.float32)
                ct = np.zeros((batch, 2 * g), np.int64)
                cb = np.zeros((batch, 2 * g), np.int64)
                for b in range(batch):
                    rows = b * num_beams + slots
                    block = warped[rows].reshape(-1)
                    picks = np.argsort(-block)[:2 * g]
                    cs[b] = block[picks]
                    ct[b] = picks % V
                    cb[b] = slots[0] + picks // V
                groups.append((slots, cs, ct, cb))
            return groups

        init = np.full(num_beams, -1e9, np.float32)
        init[::g] = 0.0
        return self._run(image_tokens, num_beams, select, length_penalty,
                         num_return_sequences, init)
