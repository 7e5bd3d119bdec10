"""CreamFL-TPU: a TPU-native multimodal federated learning framework.

A from-scratch JAX/XLA/Pallas reimplementation of the capabilities of
CreamFL ("Multimodal Federated Learning via Contrastive Representation
Ensemble", ICLR 2023; reference implementation FLAIR-THU/CreamFL).

Design stance (TPU-first, not a port):
  * All compute paths are pure functions compiled with ``jax.jit`` over a
    ``jax.sharding.Mesh``; federated clients of one model family are a
    *stacked* parameter pytree sharded over the mesh's ``clients`` axis
    instead of a Python loop over sequential models.
  * The public-set contrastive ops (inter-modal CE against a 50k gallery,
    con_w diagonal/log-sum-exp extraction) are streamed blockwise so the
    50k x 50k similarity matrix is never materialised; on TPU they run as
    fused Pallas kernels (see ``creamfl_tpu.ops``).
  * Mixed precision is bf16 compute / fp32 params (the reference uses
    NVIDIA apex AMP O2 fp16; TPU needs no loss scaling).

Layer map mirrors the reference's de-facto layering (see SURVEY.md):
  data/      <- reference src/datasets + src/utils/load_datasets.py
  models/    <- reference src/networks
  losses/    <- reference src/criterions + src/losses
  optim/     <- reference src/algorithms/optimizers.py (+AdamP reimpl)
  engine/    <- reference src/algorithms/{retrieval_trainer,base,*Trainer}.py
  federation/<- reference src/algorithms/MMFL.py
  ops/       -- TPU-native compute kernels (new; no reference equivalent)
  parallel/  -- mesh / sharding helpers (new; reference is single-GPU)
"""

__version__ = "0.1.0"
