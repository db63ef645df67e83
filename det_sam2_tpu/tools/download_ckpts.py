"""Download the official SAM 2.1 checkpoints.

TPU-native counterpart of the reference's ``checkpoints/download_ckpts.sh``
(wget loop over the four SAM 2.1 ``.pt`` files). Same URLs, same default
file names; plus an optional ``--convert`` step that runs our torch->flax
converter (det_sam2_tpu/convert.py) so the downloaded weights are
immediately loadable without torch at inference time.

Zero-egress environments fail with a clear message instead of hanging:
each request carries a connect timeout and one retry.
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import time
import urllib.error
import urllib.request
from typing import Callable, Dict, Optional

BASE_URL = "https://dl.fbaipublicfiles.com/segment_anything_2/092824"

# name -> (filename, config key for --convert)
CHECKPOINTS: Dict[str, tuple] = {
    "tiny": ("sam2.1_hiera_tiny.pt", "hiera_t"),
    "small": ("sam2.1_hiera_small.pt", "hiera_s"),
    "base_plus": ("sam2.1_hiera_base_plus.pt", "hiera_b+"),
    "large": ("sam2.1_hiera_large.pt", "hiera_l"),
}

_CHUNK = 1 << 20  # 1 MiB


def download_one(
    url: str,
    dest: str,
    opener: Optional[Callable] = None,
    timeout: float = 30.0,
    retries: int = 1,
) -> str:
    """Stream ``url`` to ``dest`` (atomic: .part then rename).

    ``opener(url, timeout=...)`` must return a file-like response (defaults
    to urllib.request.urlopen); injectable for tests.
    """
    opener = opener or urllib.request.urlopen
    tmp = dest + ".part"
    last_err: Optional[Exception] = None
    for attempt in range(retries + 1):
        try:
            with opener(url, timeout=timeout) as resp, open(tmp, "wb") as f:
                shutil.copyfileobj(resp, f, _CHUNK)
            os.replace(tmp, dest)
            return dest
        except (urllib.error.URLError, OSError) as e:  # incl. timeouts
            last_err = e
            if os.path.exists(tmp):
                os.remove(tmp)
            if attempt < retries:
                time.sleep(1.0)
    raise RuntimeError(
        f"failed to download {url}: {last_err} "
        "(no network egress? fetch the file elsewhere and pass "
        "--checkpoint to the predictors directly)"
    )


def download_checkpoints(
    out_dir: str,
    models=("tiny", "small", "base_plus", "large"),
    opener: Optional[Callable] = None,
    convert: bool = False,
    log: Callable[[str], None] = print,
) -> Dict[str, str]:
    """Download the requested SAM 2.1 checkpoints into ``out_dir``.

    Returns {model name: local path}. With ``convert=True`` each .pt is
    additionally converted to a flax-params .npz next to it (requires
    torch for the one-time load, like the reference's own loader).
    """
    os.makedirs(out_dir, exist_ok=True)
    paths: Dict[str, str] = {}
    for name in models:
        if name not in CHECKPOINTS:
            raise ValueError(
                f"unknown model {name!r}; choose from {sorted(CHECKPOINTS)}"
            )
        fname, cfg_key = CHECKPOINTS[name]
        dest = os.path.join(out_dir, fname)
        if os.path.exists(dest):
            log(f"{fname} already present, skipping")
        else:
            log(f"downloading {fname} ...")
            download_one(f"{BASE_URL}/{fname}", dest, opener=opener)
        paths[name] = dest
        if convert:
            import numpy as np

            from det_sam2_tpu.configs import MODEL_CONFIGS
            from det_sam2_tpu.convert import load_torch_checkpoint

            cfg = MODEL_CONFIGS[cfg_key]()
            params = load_torch_checkpoint(dest, cfg)
            flat = {}

            def _flatten(tree, prefix=""):
                for k, v in tree.items():
                    key = f"{prefix}/{k}" if prefix else k
                    if isinstance(v, dict):
                        _flatten(v, key)
                    else:
                        flat[key] = np.asarray(v)

            _flatten(params)
            npz = os.path.splitext(dest)[0] + ".npz"
            np.savez(npz, **flat)
            log(f"converted -> {npz}")
    log("All checkpoints are downloaded successfully.")
    return paths


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out-dir", default="checkpoints")
    p.add_argument(
        "--models",
        nargs="+",
        default=list(CHECKPOINTS),
        choices=sorted(CHECKPOINTS),
    )
    p.add_argument(
        "--convert",
        action="store_true",
        help="also convert each .pt to a flax-params .npz (needs torch)",
    )
    args = p.parse_args(argv)
    try:
        download_checkpoints(
            args.out_dir, models=args.models, convert=args.convert
        )
    except RuntimeError as e:
        print(str(e), file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
