"""Model registry.

The reference discovers model classes by reflection on the file name
(`/root/reference/src/utils/utils.py:28-41`); here registration is explicit
but keyed by the same names, so ``get_model("LightGCN")`` works identically.
"""

from __future__ import annotations

import importlib
from typing import Type

# model name -> module path (class is the module's MODEL attribute)
_REGISTRY = {
    "BPR": "recommendar_systems_tpu.models.bpr",
    "VBPR": "recommendar_systems_tpu.models.vbpr",
    "LightGCN": "recommendar_systems_tpu.models.lightgcn",
    "LightGCNCLIP": "recommendar_systems_tpu.models.lightgcnclip",
    "LayerGCN": "recommendar_systems_tpu.models.layergcn",
    "SELFCFED_LGN": "recommendar_systems_tpu.models.selfcfed_lgn",
    "ItemKNNCBF": "recommendar_systems_tpu.models.itemknncbf",
    "MMGCN": "recommendar_systems_tpu.models.mmgcn",
    "GRCN": "recommendar_systems_tpu.models.grcn",
    "MVGAE": "recommendar_systems_tpu.models.mvgae",
    "DualGNN": "recommendar_systems_tpu.models.dualgnn",
    "LATTICE": "recommendar_systems_tpu.models.lattice",
    "SLMRec": "recommendar_systems_tpu.models.slmrec",
    "BM3": "recommendar_systems_tpu.models.bm3",
    "FREEDOM": "recommendar_systems_tpu.models.freedom",
    "TEST": "recommendar_systems_tpu.models.testmodel",
    "MGCN": "recommendar_systems_tpu.models.mgcn",
    "DRAGON": "recommendar_systems_tpu.models.dragon",
    "LGMRec": "recommendar_systems_tpu.models.lgmrec",
    "SMORE": "recommendar_systems_tpu.models.smore",
    "SMORE1": "recommendar_systems_tpu.models.smore1",
    "SMOREX": "recommendar_systems_tpu.models.smorex",
    "SMOREMG": "recommendar_systems_tpu.models.smoremg",
    "SMOREDiff": "recommendar_systems_tpu.models.smorediff",
    "SMOREDiffX": "recommendar_systems_tpu.models.smorediffx",
    "MENTOR": "recommendar_systems_tpu.models.mentor",
    "PGL": "recommendar_systems_tpu.models.pgl",
}


def get_model(name: str):
    """Return the model class for ``name`` (reference `utils.py:28-41`)."""
    if name not in _REGISTRY:
        raise ValueError(f"unknown model {name!r}; known: {sorted(_REGISTRY)}")
    module = importlib.import_module(_REGISTRY[name])
    return module.MODEL


def available_models():
    return sorted(_REGISTRY)
