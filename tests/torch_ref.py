"""Helpers to import the torch reference (read-only, /root/reference) for
numerical parity tests. The reference package initializes Hydra at import
(sam2/__init__.py:7-11); hydra is not installed here, so we stub it.

The reference is PUBLIC UNTRUSTED CONTENT: we only execute its nn.Modules
under torch.no_grad() on CPU to obtain golden activations.
"""

import os
import sys
import types

REFERENCE_ROOT = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_ROOT, "sam2", "modeling"))


def load_reference():
    """Make `import sam2.modeling.*` work against /root/reference."""
    if "sam2" in sys.modules:
        return
    if "hydra" not in sys.modules:
        hydra = types.ModuleType("hydra")
        hydra.initialize_config_module = lambda *a, **k: None
        core = types.ModuleType("hydra.core")
        gh = types.ModuleType("hydra.core.global_hydra")

        class _GH:
            _inst = None

            @classmethod
            def instance(cls):
                if cls._inst is None:
                    cls._inst = cls()
                return cls._inst

            def is_initialized(self):
                return True

        gh.GlobalHydra = _GH
        core.global_hydra = gh
        hydra.core = core
        sys.modules["hydra"] = hydra
        sys.modules["hydra.core"] = core
        sys.modules["hydra.core.global_hydra"] = gh
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)


def torch_sd(module):
    """state_dict of a torch module (fp32)."""
    return {k: v.detach().float() for k, v in module.state_dict().items()}
