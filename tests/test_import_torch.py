"""Weight-import parity tests against real torch/HF reference models
(random-init tiny configs — no network needed)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

import torch

from lavila_tpu.models import import_torch as imp
from lavila_tpu.models.gpt2 import GPT2Config as JGPT2Config, GPT2LMHead
from lavila_tpu.models.distilbert import DistilBertModel
from lavila_tpu.models.openai_clip import TextTransformer, VisionTransformer
from lavila_tpu.models.timesformer import SpaceTimeTransformer


def to_np(sd):
    return {k: v.detach().float().numpy() for k, v in sd.items()}


def test_gpt2_parity_with_hf():
    from transformers import GPT2Config, GPT2LMHeadModel
    torch.manual_seed(0)
    hf_cfg = GPT2Config(vocab_size=64, n_positions=32, n_embd=32,
                        n_layer=2, n_head=4, resid_pdrop=0.0,
                        embd_pdrop=0.0, attn_pdrop=0.0)
    hf = GPT2LMHeadModel(hf_cfg).eval()
    ids = torch.tensor([[5, 9, 17, 3, 60]])
    with torch.no_grad():
        want = hf(ids).logits.numpy()

    jcfg = JGPT2Config(vocab_size=64, n_positions=32, n_embd=32, n_layer=2,
                       n_head=4)
    m = GPT2LMHead(jcfg)
    params = {"params": imp.import_gpt2(to_np(hf.state_dict()), 2)}
    got, _ = m.apply(params, jnp.asarray(ids.numpy()))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4, rtol=1e-3)


def test_distilbert_parity_with_hf():
    from transformers import DistilBertConfig
    from transformers import DistilBertModel as HFDistilBert
    torch.manual_seed(0)
    hf_cfg = DistilBertConfig(vocab_size=100, dim=32, n_heads=4,
                              hidden_dim=64, n_layers=2, dropout=0.0,
                              attention_dropout=0.0,
                              max_position_embeddings=32)
    hf = HFDistilBert(hf_cfg).eval()
    ids = torch.tensor([[2, 7, 9, 3, 1, 1]])
    mask = torch.tensor([[1, 1, 1, 1, 0, 0]])
    with torch.no_grad():
        want = hf(ids, attention_mask=mask).last_hidden_state.numpy()

    m = DistilBertModel(vocab_size=100, dim=32, num_heads=4, hidden_dim=64,
                        n_layers=2, max_position_embeddings=32)
    params = {"params": imp.import_distilbert(to_np(hf.state_dict()),
                                              n_layers=2)}
    got = m.apply(params, jnp.asarray(ids.numpy()),
                  jnp.asarray(mask.numpy()))
    # padded positions may differ (HF zeroes them differently); compare
    # the attended region
    np.testing.assert_allclose(np.asarray(got)[:, :4], want[:, :4],
                               atol=2e-4, rtol=1e-3)


class TorchClipText(torch.nn.Module):
    """Minimal torch model with the public CLIP text architecture
    (pre-LN resblocks on nn.MultiheadAttention, QuickGELU MLP, EOT pool).
    Written here as an independent parity oracle."""

    def __init__(self, vocab=64, ctx=16, width=32, heads=4, layers=2,
                 embed=8):
        super().__init__()
        self.token_embedding = torch.nn.Embedding(vocab, width)
        self.positional_embedding = torch.nn.Parameter(
            torch.randn(ctx, width) * 0.01)
        self.ln_final = torch.nn.LayerNorm(width)
        self.text_projection = torch.nn.Parameter(
            torch.randn(width, embed) * width ** -0.5)
        self.resblocks = torch.nn.ModuleList()
        for _ in range(layers):
            blk = torch.nn.Module()
            blk.ln_1 = torch.nn.LayerNorm(width)
            blk.attn = torch.nn.MultiheadAttention(width, heads)
            blk.ln_2 = torch.nn.LayerNorm(width)
            blk.mlp = torch.nn.Sequential()
            blk.mlp.add_module("c_fc", torch.nn.Linear(width, 4 * width))
            blk.mlp.add_module("c_proj", torch.nn.Linear(4 * width, width))
            self.resblocks.append(blk)
        ctx_mask = torch.full((ctx, ctx), float("-inf")).triu(1)
        self.register_buffer("mask", ctx_mask)

    def forward(self, text):
        x = self.token_embedding(text) + self.positional_embedding
        x = x.permute(1, 0, 2)
        L = x.shape[0]
        for blk in self.resblocks:
            h = blk.ln_1(x)
            a, _ = blk.attn(h, h, h, need_weights=False,
                            attn_mask=self.mask[:L, :L])
            x = x + a
            h = blk.ln_2(x)
            h = blk.mlp.c_fc(h)
            h = h * torch.sigmoid(1.702 * h)  # QuickGELU
            x = x + blk.mlp.c_proj(h)
        x = x.permute(1, 0, 2)
        x = self.ln_final(x)
        x = x[torch.arange(x.shape[0]), text.argmax(dim=-1)]
        return x @ self.text_projection


def test_clip_text_parity():
    torch.manual_seed(1)
    ref = TorchClipText().eval()
    text = torch.tensor([[1, 5, 9, 63, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]])
    with torch.no_grad():
        want = ref(text).numpy()

    # rename to the lavila/CLIP scheme the importer expects
    sd = to_np(ref.state_dict())
    renamed = {}
    for k, v in sd.items():
        k = k.replace("resblocks.", "transformer.resblocks.")
        renamed[k] = v
    m = TextTransformer(context_length=16, vocab_size=64, width=32, heads=4,
                        layers=2, embed_dim=8)
    params = {"params": imp.import_clip_text(renamed, layers=2)}
    got = m.apply(params, jnp.asarray(text.numpy()))
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-4, rtol=1e-3)


def test_clip_vit_remap_to_timesformer_single_frame_equivalence():
    """With remapped CLIP weights and a single frame, the TimeSformer must
    reproduce the plain ViT CLS feature (time attention starts at zero) —
    the property the reference's remap_keys loading relies on."""
    rng = np.random.default_rng(0)
    D, P, IMG, L = 16, 8, 16, 2
    sd = {}
    sd["visual.class_embedding"] = rng.normal(size=(D,)).astype(np.float32)
    n_tok = (IMG // P) ** 2 + 1
    sd["visual.positional_embedding"] = rng.normal(
        size=(n_tok, D)).astype(np.float32) * 0.02
    sd["visual.conv1.weight"] = rng.normal(
        size=(D, 3, P, P)).astype(np.float32) * 0.02
    for nm in ("ln_pre", "ln_post"):
        sd[f"visual.{nm}.weight"] = np.ones(D, np.float32)
        sd[f"visual.{nm}.bias"] = np.zeros(D, np.float32)
    sd["visual.proj"] = rng.normal(size=(D, 8)).astype(np.float32)
    for i in range(L):
        b = f"visual.transformer.resblocks.{i}"
        sd[f"{b}.attn.in_proj_weight"] = rng.normal(
            size=(3 * D, D)).astype(np.float32) * 0.05
        sd[f"{b}.attn.in_proj_bias"] = np.zeros(3 * D, np.float32)
        sd[f"{b}.attn.out_proj.weight"] = rng.normal(
            size=(D, D)).astype(np.float32) * 0.05
        sd[f"{b}.attn.out_proj.bias"] = np.zeros(D, np.float32)
        sd[f"{b}.mlp.c_fc.weight"] = rng.normal(
            size=(4 * D, D)).astype(np.float32) * 0.05
        sd[f"{b}.mlp.c_fc.bias"] = np.zeros(4 * D, np.float32)
        sd[f"{b}.mlp.c_proj.weight"] = rng.normal(
            size=(D, 4 * D)).astype(np.float32) * 0.05
        sd[f"{b}.mlp.c_proj.bias"] = np.zeros(D, np.float32)
        for ln in ("ln_1", "ln_2"):
            sd[f"{b}.{ln}.weight"] = np.ones(D, np.float32)
            sd[f"{b}.{ln}.bias"] = np.zeros(D, np.float32)

    # plain ViT path
    vit = VisionTransformer(input_resolution=IMG, patch_size=P, width=D,
                            layers=L, heads=4, output_dim=8)
    vit_params = {"params": imp.import_clip_vit(sd, layers=L)}
    img = jnp.asarray(rng.normal(size=(1, IMG, IMG, 3)).astype(np.float32))
    vit_cls = vit.apply(vit_params, img, apply_project=False)

    # TimeSformer path with remapped weights over a fresh init
    tsf = SpaceTimeTransformer(img_size=IMG, patch_size=P, embed_dim=D,
                               depth=L, num_heads=4, num_frames=1,
                               ln_pre=True, act="quick_gelu")
    init = tsf.init(jax.random.key(0), img[:, None])["params"]
    remapped = imp.remap_clip_visual_to_timesformer(sd, layers=L)
    loaded = imp.import_timesformer(remapped, depth=L)
    # merge: keep zero-init temporal params from init
    merged = jax.tree.map(lambda x: x, init)

    def deep_update(dst, src):
        for k, v in src.items():
            if isinstance(v, dict) and k in dst:
                deep_update(dst[k], v)
            else:
                dst[k] = jnp.asarray(v)

    deep_update(merged, loaded)
    tsf_cls = tsf.apply({"params": merged}, img[:, None])
    np.testing.assert_allclose(np.asarray(tsf_cls), np.asarray(vit_cls),
                               atol=2e-4, rtol=1e-3)


def test_inflate_temporal_embed_matches_torch_interpolate():
    te = np.random.default_rng(0).normal(size=(1, 4, 6)).astype(np.float32)
    got = imp.inflate_temporal_embed(te, 7, "bilinear")
    want = torch.nn.functional.interpolate(
        torch.tensor(te)[None], (7, 6), mode="bilinear").squeeze(0).numpy()
    np.testing.assert_allclose(got, want, atol=1e-5)
    # truncation & zeros
    assert imp.inflate_temporal_embed(te, 2, "zeros").shape == (1, 2, 6)
    z = imp.inflate_temporal_embed(te, 6, "zeros")
    assert (z[:, 4:] == 0).all()


def test_caption_loss_matches_hf_lm_loss():
    """caption_loss on our GPT-2 logits == HF's language-modeling loss on
    the same weights and tokens (pad positions ignored both sides)."""
    from transformers import GPT2Config, GPT2LMHeadModel
    from lavila_tpu import losses
    from lavila_tpu.models.gpt2 import GPT2Config as JCfg, GPT2LMHead

    torch.manual_seed(0)
    hf = GPT2LMHeadModel(GPT2Config(
        vocab_size=64, n_positions=16, n_embd=32, n_layer=2, n_head=4,
        resid_pdrop=0.0, embd_pdrop=0.0, attn_pdrop=0.0)).eval()
    ids = torch.tensor([[5, 9, 17, 3, 22, 8]])
    labels = ids.clone()
    with torch.no_grad():
        hf_loss = float(hf(ids, labels=labels).loss)

    m = GPT2LMHead(JCfg(vocab_size=64, n_positions=16, n_embd=32,
                        n_layer=2, n_head=4))
    params = {"params": imp.import_gpt2(to_np(hf.state_dict()), 2)}
    logits, _ = m.apply(params, jnp.asarray(ids.numpy()))
    # teacher-forced: predict token t+1 from prefix t (same shift as HF)
    out = losses.caption_loss(logits[:, :-1],
                              jnp.asarray(ids.numpy())[:, 1:],
                              pad_id=0)
    np.testing.assert_allclose(float(out["loss"]), hf_loss, rtol=1e-3)
