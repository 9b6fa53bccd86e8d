"""feedback_gnn_tpu — a TPU-native (JAX/XLA/Pallas) framework for
Tanner-graph message-passing decoding of quantum LDPC codes.

Re-designed from scratch with the capability surface of gongaa/Feedback-GNN
(CSS code construction, Pauli/BSC channels, binary & quaternary syndrome BP,
feedback-GNN cascades, full GNN decoders, OSD-0 post-processing, Monte-Carlo
logical-error-rate simulation, and training), built TPU-first:

* static dense graph layouts instead of ragged tensors,
* ``lax.scan`` decode loops compiled once by XLA,
* batch-in-lanes ``[..., B]`` device layouts,
* ``shard_map`` data/edge-parallel scale-out over a ``jax.sharding.Mesh``,
* optional Pallas kernels for the hot BP inner loop.
"""

__version__ = "0.1.0"

from . import codes  # noqa: F401
