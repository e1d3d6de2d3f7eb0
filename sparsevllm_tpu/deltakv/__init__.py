"""DeltaKV toolkit: compressor training + checkpoint utilities.

TPU-native counterpart of the reference src/deltakv/ training side
(train_compressor.py:49-150 + modeling/compressor.py): per-sparse-layer
residual autoencoders trained on KV collected from the base model, saved as
the checkpoint the engine's ``deltakv_checkpoint_path`` consumes.
"""

from .train_compressor import collect_kv_residuals, train_compressors

__all__ = ["collect_kv_residuals", "train_compressors"]
