"""lavila_tpu — a TPU-native (JAX/XLA/Pallas) video-language framework.

Re-implementation of the capabilities of facebookresearch/LaViLa
(video-language contrastive pretraining + visually-conditioned LLM
narrator), designed TPU-first:

  * models/    — TimeSformer video tower, CLIP text tower, DistilBERT,
                 gated GPT-2 narrator decoder, dual-encoder wrappers
                 (all flax.linen, bf16 compute / fp32 params).
  * ops/       — divided space-time attention, fused attention Pallas
                 kernels, numerics helpers.
  * parallel/  — mesh construction, sharding rules, global-batch
                 contrastive collectives.
  * data/      — native (C++/FFmpeg) video decode core, frame samplers,
                 transforms, dataset metadata parsers, prefetch loader.
  * train/     — pretrain / finetune loops, optimizer & schedules,
                 checkpoint manager with embedded config.
  * eval/      — zero-shot retrieval / classification / MCQ metrics and
                 entry points, narrator NLG evaluation.
"""

__version__ = "0.1.0"
