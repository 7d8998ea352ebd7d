"""X-GGM-TPU: a TPU-native (JAX/XLA/Pallas/pjit) framework with the
capabilities of jingjing12110/X-GGM (Graph Generative Modeling for
Out-of-Distribution Generalization in Visual Question Answering, ACM MM'21).

Layer map (mirrors SURVEY.md §1, re-architected TPU-first):

  config     - import-safe dataclasses (replaces reference src/param.py global argparse)
  data       - WordPiece tokenizer, H5/packed-binary datasets, device feeders
  models     - LXMERT encoder stack, task models, pretraining heads (flax.linen)
  ggm        - graph generative module: GCN/GIN/GAT generators, discriminators
  ops        - noise utilities, losses, segment ops, Pallas kernels
  training   - BertAdam (optax), jitted train steps, trainers
  parallel   - device mesh + sharding rules (SPMD data parallelism over ICI)
  evals      - in-training evaluators + official GQA-OOD / VQA metric engines
  checkpoint - orbax checkpointing + PyTorch/LXMERT weight bridge
"""

__version__ = "0.1.0"
