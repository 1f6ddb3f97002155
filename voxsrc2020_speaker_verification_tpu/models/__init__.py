"""Speaker-embedding model zoo: TDNN, Res2Net family, DPN (reference parity)
plus ECAPA-TDNN (framework extension, arXiv:2005.07143).

``get_model(name)`` resolves the same model ids the reference recipes pass as
``model_id`` (ref run_*.sh; tf_train_tdnn.py:146 importlib resolution).
"""

from __future__ import annotations

from .tdnn import Tdnn, TDNN_VARIANTS, register_tdnn_variant, tdnn
from .res2net import (Res2Net, Res2NetConfig, RES2NET_CONFIGS,
                      register_res2net_variant, res2net)
from .dpn import Dpn, DpnConfig, DPN_CONFIGS, dpn
from .ecapa import Ecapa, EcapaConfig, ECAPA_CONFIGS, ecapa

MODEL_NAMES = (("tdnn",) + tuple(RES2NET_CONFIGS) + tuple(DPN_CONFIGS)
               + tuple(ECAPA_CONFIGS))


def get_model(name: str, dtype=None, remat: bool = False, remat_policy=None,
              remat_stages=None, remat_keep_blocks=None):
    """Build a model by recipe id. dtype is the compute dtype (bf16 for train);
    remat enables per-block rematerialization (res2net and dpn families)."""
    if name == "tdnn" or name in TDNN_VARIANTS:
        return tdnn(name, dtype=dtype)
    if name in RES2NET_CONFIGS:
        return res2net(name, dtype=dtype, remat=remat,
                       remat_policy=remat_policy, remat_stages=remat_stages,
                       remat_keep_blocks=remat_keep_blocks)
    if name in DPN_CONFIGS:
        return dpn(name, dtype=dtype, remat=remat,
                   remat_policy=remat_policy, remat_stages=remat_stages,
                   remat_keep_blocks=remat_keep_blocks)
    if name in ECAPA_CONFIGS:
        return ecapa(name, dtype=dtype)
    raise ValueError(f"unknown model {name!r}; available: {MODEL_NAMES}")
