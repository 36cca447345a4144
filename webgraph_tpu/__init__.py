"""webgraph_tpu — a TPU-native graph compression and analysis framework.

A from-scratch re-design of WebGraph (big) for TPUs: BVGraph and EFGraph
codecs with vectorized JAX/XLA decode-encode engines, an out-of-core
transformation engine, device-parallel analytics, labelled and typed
graphs, and multi-chip data parallelism over jax.sharding meshes.

See SURVEY.md for the reference structural map this build follows.
"""

__version__ = "0.1.0"
