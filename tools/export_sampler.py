"""Export a trained run's sampler as a self-contained AOT artifact.

Serving counterpart of the reference's sample-only mode (``train=false``
warm-start runs, reference base_experiment.py:71-112): instead of needing the
full framework + checkpoint at serving time, this packages the entire jitted
sampling program (params baked in) into one file via utils/serving.py.

    python tools/export_sampler.py -cp runs/MyExp/run -cn config \
        [--idx 0] [--no-ema] [--batch 1024] [--out sampler.v4h] [overrides...]

Loads the run's config, instantiates the model, partial-restores the params
(EMA by default when the run used EMA) from ``models/model_run{idx}``, and
writes ``<run_dir>/sampler.v4h`` (or --out). Serve with:

    from vit4hep_tpu.utils.serving import load_sampler
    sampler = load_sampler("sampler.v4h")
    showers = sampler(cond, seed=0)   # cond: (batch, cond_dim) float32

Run from the platform you serve on (TPU process for TPU serving) — see the
cross-platform note in utils/serving.py.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("-cp", dest="config_path", required=True,
                    help="run dir containing config.yaml and models/")
    ap.add_argument("-cn", dest="config_name", default="config")
    ap.add_argument("--idx", type=int, default=None,
                    help="checkpoint index (default: the run's highest)")
    ap.add_argument("--no-ema", action="store_true",
                    help="export raw params even when the run used EMA")
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--generator", action="store_true",
                    help="export the FULL two-stage chain (energy model -> "
                         "u mapping -> this shape model) as one "
                         "generate(E_inc)->shower artifact; requires the "
                         "run's config to carry sample_us + energy_model "
                         "(experiments/fused_chain.py)")
    ap.add_argument("--out", default=None,
                    help="output path (default <run_dir>/sampler.v4h, or "
                         "generator.v4h with --generator)")
    ap.add_argument("overrides", nargs="*", help="hydra-style config overrides")
    arg = ap.parse_args(argv)

    if os.environ.get("JAX_PLATFORMS"):
        # the axon TPU plugin overrides JAX_PLATFORMS from the environment;
        # re-assert it (same guard as main.py) so CPU exports stay on CPU
        import jax

        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    import jax

    from vit4hep_tpu.utils.checkpoint import load_checkpoint
    from vit4hep_tpu.utils.config import compose, instantiate
    from vit4hep_tpu.utils.serving import save_sampler

    run_dir = os.path.abspath(arg.config_path)
    cfg = compose(run_dir, arg.config_name, list(arg.overrides))
    model = instantiate(cfg.model)
    template = model.init_params(jax.random.PRNGKey(0))

    idx = arg.idx
    if idx is None:
        runs = [int(d.rsplit("model_run", 1)[1])
                for d in os.listdir(os.path.join(run_dir, "models"))
                if d.startswith("model_run")
                and d.rsplit("model_run", 1)[1].isdigit()]
        if not runs:
            raise SystemExit(f"no checkpoints under {run_dir}/models")
        idx = max(runs)
    ckpt = os.path.join(run_dir, "models", f"model_run{idx}")

    use_ema = bool(cfg.get("ema", False)) and not arg.no_ema
    key = "ema_params" if use_ema else "params"
    restored = load_checkpoint(ckpt, target={key: template})[key]
    params = jax.tree.map(lambda t, r: jax.numpy.asarray(r, t.dtype),
                          template, restored)

    meta = {"run_dir": run_dir, "checkpoint": f"model_run{idx}",
            "ema": use_ema, "exp_name": cfg.get("exp_name")}
    if arg.generator:
        if not cfg.get("sample_us") or not cfg.get("energy_model"):
            raise SystemExit(
                "--generator needs a shape-model run with sample_us: true "
                "and energy_model: <run dir> in its config")
        import importlib

        from vit4hep_tpu.utils.config import OmegaConf
        from vit4hep_tpu.utils.serving import save_generator
        from vit4hep_tpu.utils.torch_migration import load_net_params

        def family_transforms(exp_type):
            # each family's experiment parameterizes its transforms module
            # (experiments/*.py transforms_module); resolve the same way
            # from the run's exp_type so two-stage runs of ANY family export
            fam = str(exp_type or "calochallenge").split("_")[0]
            if fam not in ("calochallenge", "calogan", "lemurs",
                           "calohadronic"):
                fam = "calochallenge"
            return importlib.import_module(f"vit4hep_tpu.data.{fam}.transforms")

        e_cfg = OmegaConf.load(
            os.path.join(str(cfg.energy_model), "config.yaml"))
        e_mod = family_transforms(e_cfg.get("exp_type"))
        s_mod = family_transforms(cfg.get("exp_type"))
        e_transforms = e_mod.build_pipeline(e_cfg.data.transforms,
                                            str(e_cfg.run_dir), e_mod)
        s_transforms = s_mod.build_pipeline(cfg.data.transforms, run_dir,
                                            s_mod)
        e_model, e_params, _ = load_net_params(
            e_cfg.model,
            os.path.join(str(e_cfg.run_dir), "models", "model_run0"),
            jax.random.PRNGKey(0))
        out = arg.out or os.path.join(run_dir, "generator.v4h")
        # per-family cond composition, matching each staged sample_n:
        # CaloGAN appends u LAST ([cond | u], experiments/calogan.py);
        # LEMURS conditions the energy model on only the first 3 cond
        # columns ([E,theta,phi]) while the shape cond also carries the
        # label one-hot (experiments/lemurs.py sample_n)
        fam = str(cfg.get("exp_type") or "calochallenge").split("_")[0]
        u_position = "last" if fam == "calogan" else "first"
        energy_cond_width = (int(e_model.condition_dim)
                             if fam == "lemurs" else None)
        from vit4hep_tpu.experiments.fused_chain import UnsupportedTransform

        try:
            header = save_generator(
                out, model, params, e_model, e_params, e_transforms,
                s_transforms, arg.batch, u_position=u_position,
                energy_cond_width=energy_cond_width,
                meta=dict(meta, energy_run=str(cfg.energy_model)),
            )
        except UnsupportedTransform as e:
            raise SystemExit(f"--generator: {e}")
        print(f"wrote {out}: {header['model']} batch={header['batch']} "
              f"cond_dim={header['cond_dim']} out={header['out_shape']} "
              f"platforms={header['platforms']} ema={use_ema}")
        return

    out = arg.out or os.path.join(run_dir, "sampler.v4h")
    header = save_sampler(
        out, model, params, arg.batch,
        meta=meta,
    )
    print(f"wrote {out}: {header['model']} batch={header['batch']} "
          f"cond_dim={header['cond_dim']} out={header['out_shape']} "
          f"platforms={header['platforms']} ema={use_ema}")


if __name__ == "__main__":
    main()
