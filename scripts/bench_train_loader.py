"""End-to-end training throughput WITH the real data pipeline (VERDICT r4 #6).

`train512.json` measured the device step alone (46.1 imgs/s at the
shipped config, R=512 bs=4, configs/config_train_sfd2.json). This runs
the REAL `Trainer.train()` loop — `PairLoader` crop-search +
homography/photometric augmentation on host threads
(tools/dataloader.py:148-188 semantics), the ONLINE UPerNet semantic
teacher labelling every batch on device (trainer.py:290), the jitted
train step, per-epoch checkpointing — for ≥200 steps on the TPU, then
exercises checkpoint RESUME (trainer.py:349-382 parity) and verifies
loss continuity.

Prints ONE JSON line and writes train_loader.json at the repo root.
Env: TL_STEPS (default 200), TL_R (512), TL_BS (4), TL_IMAGES (48).
Run under an external timeout; cold train-step compile is ~4-5 min
(served from .jax_cache/ on retries).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

_REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(_REPO))

from sfd2_tpu.utils.benchtime import enable_compile_cache  # noqa: E402


def main():
    import jax

    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    enable_compile_cache(str(_REPO))
    on_tpu = jax.default_backend() == "tpu"

    steps = int(os.environ.get("TL_STEPS", "200" if on_tpu else "4"))
    r = int(os.environ.get("TL_R", "512" if on_tpu else "64"))
    bs = int(os.environ.get("TL_BS", "4" if on_tpu else "2"))
    n_imgs = int(os.environ.get("TL_IMAGES", "48" if on_tpu else "8"))

    import cv2

    from sfd2_tpu.training.data import (ImageFolderDataset, PairLoader,
                                        SyntheticPairBuilder)
    from sfd2_tpu.training.seg_teacher import SegTeacher, SegTeacherLoader
    from sfd2_tpu.training.trainer import Trainer, TrainerConfig

    # Synthetic "Aachen-day" image folder: textured noise so crop-search
    # and the photometric pipeline run at production resolutions.
    rng = np.random.default_rng(5)
    img_dir = Path(tempfile.mkdtemp()) / "imgs"
    img_dir.mkdir(parents=True)
    for i in range(n_imgs):
        base = rng.integers(0, 255, (r + 160, r + 220, 3), np.uint8)
        img = cv2.GaussianBlur(base, (0, 0), 3) + rng.integers(
            0, 40, (r + 160, r + 220, 3), np.uint8)
        cv2.imwrite(str(img_dir / f"{i:04d}.png"), img)

    dataset = ImageFolderDataset(img_dir)
    builder = SyntheticPairBuilder(crop=r)
    loader = SegTeacherLoader(
        PairLoader(dataset, builder, batch_size=bs, workers=4,
                   iters_per_epoch=steps // 2),
        SegTeacher(),
    )

    run_dir = Path(tempfile.mkdtemp()) / "run"
    cfg = TrainerConfig(
        epochs=2, iters_per_epoch=steps // 2, batch_size=bs,
        save_dir=str(run_dir), run_name="loaderbench", log_every=25,
    )
    trainer = Trainer(loader, cfg, seed=3)

    # Warm the step + teacher compiles OFF the clock (cold remote compile
    # is minutes; sustained-rate claims must not include it). One direct
    # step-fn call with a loader batch, state NOT advanced.
    import jax.numpy as jnp

    from sfd2_tpu.training.train_step import TrainBatch

    t0 = time.time()
    warm = next(iter(loader.epoch(999)))
    wb = TrainBatch(
        image1=jnp.asarray(warm["image1"]), image2=jnp.asarray(warm["image2"]),
        gray1=jnp.asarray(warm["gray1"]), gray2=jnp.asarray(warm["gray2"]),
        aflow=jnp.asarray(warm["aflow"]), seg1=jnp.asarray(warm["seg1"]),
    )
    _, wm = trainer._step_for(True)(trainer.state, wb, jax.random.PRNGKey(0))
    float(wm["loss"])
    compile_s = time.time() - t0

    t0 = time.time()
    trainer.train(resume=False)  # 2 epochs × steps/2 = `steps` steps
    wall = time.time() - t0
    imgs = steps * bs * 2  # each pair = 2 images through the student
    sustained = imgs / wall

    # --- checkpoint resume continuity -----------------------------------
    trainer2 = Trainer(loader, cfg, seed=3)
    ok = trainer2.resume()
    assert ok, "resume found no checkpoint"
    resumed_step = int(trainer2.state.step)
    loss_before = trainer.best_loss
    mean3 = trainer2.process_epoch(2)  # a fresh epoch from the ckpt
    cont_ratio = mean3 / loss_before if loss_before else float("nan")

    out = {
        "metric": "train_loader_imgs_per_s",
        "value": round(sustained, 2),
        "unit": "imgs/s",
        "steps": steps,
        "R": r, "bs": bs,
        "wall_s": round(wall, 1),
        "warm_extra_s": round(compile_s, 1),
        "device_step_ceiling_imgs_per_s": 46.1,  # train512.json artifact
        "loader_efficiency_vs_ceiling": round(sustained / 46.1, 3),
        "resume_step": resumed_step,
        "resume_expected_step": steps,
        "resume_loss_ratio_next_epoch": round(cont_ratio, 3),
        "resume_ok": bool(resumed_step == steps and
                          np.isfinite(cont_ratio) and cont_ratio < 1.5),
        "platform": jax.default_backend(),
    }
    (_REPO / "train_loader.json").write_text(json.dumps(out, indent=1))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
