"""Parameter freezing as optimizer masking.

The reference freezes parts by toggling ``requires_grad``
(reference: timesformer.py:325-343 freeze_spatial/temporal_weights,
gpt2_gated.py:1019-1028 freeze_lm_weights, models.py:334-345
timesformer_freeze_space, main_pretrain.py:176 freeze_temperature).
In optax the same is a ``multi_transform`` that routes frozen leaves to
``set_to_zero`` — the pytree stays intact (checkpoints identical), only
updates vanish.
"""

from __future__ import annotations

from typing import Callable

import jax
import optax


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", getattr(k, "name", "")))
                    for k in path)


def freeze_by_predicate(tx: optax.GradientTransformation,
                        frozen: Callable[[str], bool]
                        ) -> optax.GradientTransformation:
    """Wrap ``tx`` so leaves whose path satisfies ``frozen`` get no
    updates."""

    def labels(params):
        return jax.tree_util.tree_map_with_path(
            lambda p, _: "frozen" if frozen(_path_str(p)) else "train",
            params)

    return optax.multi_transform(
        {"train": tx, "frozen": optax.set_to_zero()}, labels)


# --- predicates matching the reference freeze flags ----------------------

def temporal_parts(path: str) -> bool:
    """TimeSformer temporal branch: temporal PE, time attention, its norm
    (reference timesformer.py:328)."""
    return ("temporal_embed" in path or "timeattn" in path
            or "norm3" in path)


def spatial_parts(path: str) -> bool:
    """Everything in the vision tower EXCEPT the temporal branch
    (reference freeze_spatial_weights)."""
    if "vision_model" not in path and "visual" not in path:
        return False
    return not temporal_parts(path)


def lm_parts(path: str) -> bool:
    """GPT-2 weights except the cross-attention insertions
    (reference gpt2_gated.py:1019-1028)."""
    if "text_decoder" not in path:
        return False
    for keep in ("crossattention", "ln_cross_attn", "ln_2_crossattention",
                 "mlp_crossattention", "alpha_cattn", "alpha_dense"):
        if keep in path:
            return False
    return True


def logit_scale_only(path: str) -> bool:
    return path.endswith("logit_scale")


def pseudo_scale_only(path: str) -> bool:
    """SSLCLIPLoss's criterion-owned pseudo temperature (reference
    loss.py:141-143 freeze_scale; lives under the packed tree's
    'criterion' branch, so freeze_temperature never touches it)."""
    return path.endswith("logit_scale_pseudo")


def build_freeze_predicate(*, freeze_temperature=False,
                           timesformer_freeze_space=False,
                           freeze_visual_vclm=False,
                           freeze_visual_vclm_temporal=False,
                           freeze_lm_vclm=False,
                           freeze_pseudo_temperature=False
                           ) -> Callable[[str], bool]:
    preds = []
    if freeze_temperature:
        preds.append(logit_scale_only)
    if freeze_pseudo_temperature:
        preds.append(pseudo_scale_only)
    if timesformer_freeze_space or freeze_visual_vclm:
        preds.append(spatial_parts)
    if freeze_visual_vclm_temporal:
        preds.append(lambda p: ("vision_model" in p or "visual" in p)
                     and temporal_parts(p))
    if freeze_lm_vclm:
        preds.append(lm_parts)
    if not preds:
        return lambda p: False
    return lambda p: any(f(p) for f in preds)
