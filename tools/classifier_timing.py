"""Time the evaluation classifier suite as the training job it is
(VERDICT r4 next #6 / SURVEY §3.4: 50-100 epochs of DNN — "a training job
in its own right" inside `run_from_py`).

Builds synthetic ds2-shaped classifier data (the prepare_low layout:
[log10 Einc | 6480 voxels | label], the exact arrays `run_from_py` hands
to `_run_classifier`), then times `train_classifier` + calibrated
`evaluate_classifier` at reference-config settings (2x2048 DNN, batch
1000, 50 epochs — reference evaluate.py:181-319 / run_from_py defaults).

Also reports per-epoch wall time and the step decomposition (jitted
train-epoch vs eval/calibration) so a dispatch-overhead pathology would be
visible. Use --events/--epochs to scale; --resnet adds the ResNet3D tier
(ds2 img shape 45x16x9).

Run: python tools/classifier_timing.py [--events 100000] [--epochs 50]
     [--resnet] [--smoke]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("JAX_PLATFORMS"):
    import jax

    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import numpy as np

import jax


def main():
    from vit4hep_tpu.evaluation.classifiers import (
        DNN, ClassifierConfig, evaluate_classifier, generate_model,
        train_classifier)
    from vit4hep_tpu.evaluation.ugr_evaluation import ttv_split

    smoke = "--smoke" in sys.argv
    args = dict(a.split("=", 1) for a in sys.argv[1:] if "=" in a)
    n_events = int(args.get("--events", 1000 if smoke else 100_000))
    n_epochs = int(args.get("--epochs", 2 if smoke else 50))
    n_vox = 6480  # ds2

    print(f"device: {jax.devices()[0].platform}  events {n_events} "
          f"(x2 classes)  epochs {n_epochs}", flush=True)
    rng = np.random.default_rng(0)

    def fake(label):
        # prepare_low layout: [log10 Einc, voxels/Einc, label]
        e = rng.uniform(3, 6, (n_events, 1)).astype(np.float32)
        vox = rng.exponential(0.1, (n_events, n_vox)).astype(np.float32)
        if label:  # make the classes weakly separable
            vox *= 1.02
        lab = np.full((n_events, 1), float(label), np.float32)
        return np.concatenate([e, vox, lab], axis=1)

    src, ref = fake(0), fake(1)
    train, test, val = ttv_split(src, ref)
    cfg = ClassifierConfig(lr=2e-4, batch_size=1000, n_epochs=n_epochs)

    model = DNN(num_layer=2, num_hidden=2048, dropout_probability=0.2)
    t0 = time.perf_counter()
    _, apply_fn = train_classifier(model, train, test, cfg)
    t_train = time.perf_counter() - t0
    t0 = time.perf_counter()
    acc, auc, jsd = evaluate_classifier(apply_fn, val, calibration_data=test,
                                        final_eval=True)
    t_eval = time.perf_counter() - t0
    n_steps = n_epochs * (len(train) + cfg.batch_size - 1) // cfg.batch_size
    print(f"cls-low DNN 2x2048: train {t_train:8.1f} s "
          f"({t_train / n_epochs:6.2f} s/epoch, "
          f"{t_train / max(1, n_steps) * 1e3:6.1f} ms/step at batch "
          f"{cfg.batch_size}) + eval/calibrate {t_eval:6.1f} s  "
          f"AUC {auc:.3f}", flush=True)

    if "--resnet" in sys.argv:
        # exactly _run_classifier's cls-resnet invocation: same prepare_low
        # arrays, ResNet3D reshapes the voxel block internally
        rcfg = ClassifierConfig(lr=2e-4, batch_size=cfg.batch_size,
                                n_epochs=n_epochs, optimizer="AdamW")
        rmodel = generate_model(18, img_shape=(45, 16, 9))
        t0 = time.perf_counter()
        _, rapply = train_classifier(rmodel, train, test, rcfg)
        t_rtrain = time.perf_counter() - t0
        t0 = time.perf_counter()
        _, rauc, _ = evaluate_classifier(rapply, val, calibration_data=test,
                                         final_eval=True)
        print(f"cls-resnet ResNet3D-18: train {t_rtrain:8.1f} s "
              f"({t_rtrain / rcfg.n_epochs:6.2f} s/epoch) + eval "
              f"{time.perf_counter() - t0:6.1f} s  AUC {rauc:.3f}",
              flush=True)


if __name__ == "__main__":
    main()
