"""shapemol_tpu — TPU-native shape-conditioned 3D molecule generation framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of ShapeMol
(reference: Amelie-Schreiber/ShapeMol): a rotation-equivariant point-cloud
shape autoencoder (stage 1) and a shape-conditioned joint diffusion model over
atom coordinates and atom types (stage 2), plus sampling, reconstruction and
evaluation stacks.

Design principles (TPU-first, not a port):
  * fixed-shape padded batches (B, N_max) with masks instead of PyG's ragged
    concat+scatter idiom — everything tiles onto the MXU;
  * dense k-NN neighborhoods as (B, N, K) gather tensors rather than edge
    lists; all message passing is batched matmuls;
  * the entire reverse-diffusion sampler is one `lax.scan` under a single
    `jit` (the reference does 1000 Python-loop steps with per-step D2H copies);
  * scaling via `jax.sharding.Mesh` + NamedSharding data-parallel collectives
    over ICI; no torch.distributed analog needed;
  * host-side chemistry (parsing, bond perception, reconstruction, metrics)
    is self-contained (no RDKit/OpenBabel requirement), with optional C++
    acceleration for bond perception.
"""

__version__ = "0.1.0"
