"""HF/transformers-side toolkit (reference src/deltakv wrapper world).

The reference keeps a parallel HF implementation of its sparse methods
(src/deltakv/modeling/cache_pipeline.py, token_select.py,
get_chat_api.py) as the accuracy oracle the engine is validated against.
This package is the TPU build's slice of that world: pure-torch sparse
caches + a backend-switched generate API, used for engine-vs-HF parity
on any checkpoint transformers can load.
"""

from .generate_api import get_generate_api  # noqa: F401
