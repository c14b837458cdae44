#!/usr/bin/env python
"""Debug: distribution of mACCDOA track norms after 16-way ACS averaging in
the tiny-HTSAT fullchain fixture (why does sed_threshold=0.1 yield zero
detections?)."""
import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np  # noqa: E402
import torch  # noqa: E402

import conftest  # noqa: E402, F401  (installs reference shims)
import test_fullchain_parity as tfp  # noqa: E402


class TPF:
    def __init__(self, base):
        self.base = Path(base)
        self.n = 0

    def mktemp(self, name):
        p = self.base / f"{name}{self.n}"
        self.n += 1
        p.mkdir(parents=True)
        return p


def main():
    import tempfile
    with tempfile.TemporaryDirectory() as td:
        corpus, work, tmodel, ckpt = tfp.setup_htsat.__wrapped__(TPF(td))
        from pseldnets_tpu.config import compose
        from pseldnets_tpu.data import SELDDataModule, get_dataset

        cfg = compose(str(REPO / "configs"), "infer",
                      tfp._overrides_htsat(corpus, work,
                                           ["mode=valid",
                                            f"ckpt_path={ckpt}",
                                            "post_processing=ACS",
                                            "sed_threshold=0.1"]))
        dataset = get_dataset("chain4_ov1", cfg)
        dm = SELDDataModule(cfg, dataset, stage="fit")
        paired = tfp._torch_forward_htsat_paired(cfg, tmodel)
        acs = tfp._torch_forward_acs(cfg, tmodel, plain=paired)
        for batch in dm.val_dataloader():
            wav = np.asarray(batch["data"], np.float32)
            y_plain = paired(wav).numpy()
            # variant-dependence: forward two distinct ACS variants RAW
            # (no de-rotation) and compare
            x1 = wav  # identity variant
            x2 = np.stack([wav[:, 0], -wav[:, 3], wav[:, 2], -wav[:, 1]],
                          axis=1)  # a sign+swap variant
            x3 = np.stack([wav[:, 0], wav[:, 1], wav[:, 2], -wav[:, 3]],
                          axis=1)  # pure sign flip of one directional ch
            d = (paired(x1).numpy() - paired(x2).numpy())
            d3 = (paired(x1).numpy() - paired(x3).numpy())
            import jax.numpy as jnp
            from pseldnets_tpu.ops import make_extractor
            ext = make_extractor(cfg)
            f1 = np.asarray(ext(jnp.asarray(x1)))
            f3 = np.asarray(ext(jnp.asarray(x3)))
            df = np.abs(f1 - f3)
            print(f"swap-variant max|dy|={np.abs(d).max():.5f} "
                  f"signflip max|dy|={np.abs(d3).max():.6f} "
                  f"signflip per-feature-ch max|df|="
                  f"{[f'{v:.4f}' for v in df.reshape(df.shape[0], 7, -1).max(axis=(0, 2))]} "
                  f"mean|y|={np.abs(y_plain).mean():.4f}", flush=True)
            y_acs = acs(wav).numpy()
            for tag, y in (("plain", y_plain), ("acs", y_acs)):
                B, T = y.shape[:2]
                v = y.reshape(B, T, 3, 3, -1)  # tracks, xyz, classes
                norms = np.linalg.norm(v, axis=3)
                print(f"{tag}: norm pctl 50/90/99/max = "
                      f"{np.percentile(norms, [50, 90, 99]).round(4)} "
                      f"{norms.max():.4f}  frac>0.1={float((norms > 0.1).mean()):.4f}",
                      flush=True)
            break


if __name__ == "__main__":
    main()
