"""Import the reference torch implementation (read-only at /root/reference)
as a *test oracle*. Only used to verify behavioral parity; never shipped.

The reference imports timm (for checkpoint downloads) and ba3l/sacred (for
config DI) at module scope — both irrelevant for oracle use and not installed
here, so they are stubbed before import.
"""

import os
import sys
import types

REFERENCE_ROOT = "/root/reference"


def reference_available() -> bool:
    try:
        import torch  # noqa: F401
    except ImportError:
        return False
    return os.path.isdir(os.path.join(REFERENCE_ROOT, "models"))


def _install_stubs():
    if "timm" not in sys.modules:
        timm = types.ModuleType("timm")
        models = types.ModuleType("timm.models")
        hub = types.ModuleType("timm.models._hub")

        def _no_net(*a, **k):
            raise RuntimeError("no network in test environment")

        hub.download_cached_file = _no_net
        timm.models = models
        models._hub = hub
        sys.modules.update({"timm": timm, "timm.models": models, "timm.models._hub": hub})

    if "ba3l" not in sys.modules:
        class _Ingredient:
            def __init__(self, *a, **k):
                pass

            def command(self, f=None, **k):
                return f if f is not None else (lambda g: g)

            config = command

            def add_config(self, **k):
                pass

        ba3l = types.ModuleType("ba3l")
        ing = types.ModuleType("ba3l.ingredients")
        ingi = types.ModuleType("ba3l.ingredients.ingredient")
        ingi.Ingredient = _Ingredient
        ba3l.ingredients = ing
        ing.ingredient = ingi
        sys.modules.update(
            {"ba3l": ba3l, "ba3l.ingredients": ing, "ba3l.ingredients.ingredient": ingi}
        )


def load_reference_passt_module():
    _install_stubs()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    from models import passt as ref_passt  # noqa: E501

    return ref_passt
