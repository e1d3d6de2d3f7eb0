"""Dense (vanilla / omnikv) page manager.

Reference counterparts: engine/cache_manager/standard.py (dense slot pools)
and omnikv.py:9-11 (OmniKV storage == standard; its sparsity is logical,
applied as an in-scan selection mask by the executor). All behavior lives in
the base class; this subclass exists for registry clarity.
"""

from __future__ import annotations

from .base import KVCacheManager


class StandardKVManager(KVCacheManager):
    pass
