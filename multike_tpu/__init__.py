"""MultiKE-TPU: a TPU-native multi-view knowledge-graph embedding framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
nju-websoft/MultiKE (IJCAI 2019, "Multi-view Knowledge Graph Embedding for
Entity Alignment"): entity embeddings of two KGs under name / relation /
attribute views, cross-KG identity & predicate inference, two view-combination
strategies (ITC and SSL), and entity-alignment evaluation (Hits@k / MR / MRR).

Reference layer map: /root/reference/code (see SURVEY.md). This package is not
a port; the compute path is jit/scan/pallas with static shapes, on-device
negative sampling, and a blockwise rank-count evaluation engine that never
materializes the n1 x n2 similarity matrix.
"""

__version__ = "0.1.0"

from multike_tpu.config import Config, load_config  # noqa: F401
