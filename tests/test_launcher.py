"""Config system + launcher end-to-end tests (tiny synthetic volumes, CPU)."""

import json
import os

import numpy as np
import pytest

from mri_interpolation_tpu import configs
from mri_interpolation_tpu.configs import RunConfig
from mri_interpolation_tpu.io import nifti, synthetic_volume
from mri_interpolation_tpu.launcher import build_model, build_parser, make_run_dir, run

pytestmark = pytest.mark.slow  # full-pipeline/protocol layer (run with -m slow; excluded from the fast unit run)


@pytest.fixture()
def tiny_volume_path(tmp_path):
    vol = synthetic_volume((10, 10, 6), seed=1)
    path = str(tmp_path / "tiny.nii.gz")
    nifti.save(vol, path)
    return path


class TestConfig:
    def test_defaults_match_reference_hash_config(self):
        cfg = configs.default_hash_config()
        assert cfg.batch_size == 10000 and cfg.epochs == 1 and cfg.lr == 5e-3
        assert cfg.n_levels == 4 and cfg.log2_hashmap_size == 23
        assert cfg.base_resolution == (64, 64, 5) and cfg.finest_resolution == (352, 352, 15)
        assert cfg.interp_shapes == ((352, 352, 30),)

    def test_flag_override(self):
        parser = build_parser()
        args = parser.parse_args(["--batch_size", "123", "--epochs", "7", "--model_class", "siren"])
        cfg = configs.override_from_args(configs.default_hash_config(), args)
        assert cfg.batch_size == 123 and cfg.epochs == 7 and cfg.model_class == "siren"

    def test_enco_config_merge(self, tmp_path):
        enco = {
            "loss": {"otype": "RelativeL2"},
            "optimizer": {"otype": "Adam", "learning_rate": 1e-2, "beta2": 0.99,
                          "epsilon": 1e-15, "l2_reg": 1e-6},
            "encoding": {"otype": "HashGrid", "n_levels": 16, "n_features_per_level": 2,
                         "log2_hashmap_size": 19, "base_resolution": 16, "per_level_scale": 1.4},
            "network": {"otype": "FullyFusedMLP", "n_neurons": 128, "n_hidden_layers": 2},
        }
        p = tmp_path / "enco.json"
        p.write_text(json.dumps(enco))
        cfg = configs.apply_enco_config(configs.default_hash_config(), configs.load_json_config(str(p)))
        assert cfg.n_levels == 16 and cfg.per_level_scale == 1.4 and cfg.finest_resolution is None
        assert cfg.loss == "relative_l2" and cfg.optimizer == "adam_tcnn"
        assert cfg.lr == 1e-2 and cfg.weight_decay == 1e-6 and cfg.dim_hidden == 128

    def test_yaml_config_reference_schema(self, tmp_path):
        # the reference's config/base.yaml schema (config/base.yaml:1-32),
        # loaded by nothing there — wired in here
        doc = """
training:
  epochs: 3
siren:
  cls: SirenNet
  dim_in: 3
  dim_hidden: 256
  dim_out: 1
  n_layers: 5
  w0: 30.0
  w0initial: 30.0
encoding:
  otype: "HashGrid"
  n_levels: 16
  n_features_per_level: 2
  log2_hashmap_size: 16
  base_resolution: 16
  per_level_scale: 2
datamodule:
  _target_: MriDataModule
  mri_path: "data/t2_111.nii.gz"
  output_path: "results_siren/"
  batch_size: 1
optimizer:
  _target_: FakeOptimizer
"""
        p = tmp_path / "base.yaml"
        p.write_text(doc)
        cfg = configs.load_yaml_config(str(p))
        assert cfg.model_class == "siren" and cfg.epochs == 3
        assert cfg.dim_hidden == 256 and cfg.n_layers == 5 and cfg.w0_initial == 30.0
        assert cfg.n_levels == 16 and cfg.per_level_scale == 2 and cfg.finest_resolution is None
        assert cfg.image_path == "data/t2_111.nii.gz" and cfg.output_root == "results_siren/"
        # batch_size 1 is the reference's frame-loader placeholder; keep default
        assert cfg.batch_size == 10000
        # FakeOptimizer is ignored
        assert cfg.optimizer == "adam"

    def test_yaml_run_section_and_tuples(self, tmp_path):
        p = tmp_path / "run.yaml"
        p.write_text(
            "run:\n  model_class: hash_mlp\n  batch_size: 2048\n"
            "  base_resolution: [8, 8, 2]\n  interp_shapes: [[16, 16, 8]]\n"
        )
        cfg = configs.load_yaml_config(str(p))
        assert cfg.batch_size == 2048
        assert cfg.base_resolution == (8, 8, 2)
        assert cfg.interp_shapes == ((16, 16, 8),)

    def test_yaml_cli_flag(self, tmp_path):
        p = tmp_path / "c.yaml"
        p.write_text("run:\n  epochs: 9\n")
        parser = build_parser()
        args = parser.parse_args(["--config_yaml", str(p)])
        cfg = configs.load_yaml_config(args.config_yaml, base=configs.default_hash_config())
        cfg = configs.override_from_args(cfg, args)
        assert cfg.epochs == 9

    def test_config_txt_roundtrip(self, tmp_path):
        cfg = configs.default_hash_config()
        configs.export_to_txt(cfg, str(tmp_path) + os.sep)
        parsed = configs.parse_config_txt(str(tmp_path / "config.txt"))
        assert parsed["batch_size"] == "10000"
        assert parsed["model_class"] == "hash_mlp"

    def test_run_dir_versioning(self, tmp_path):
        root = str(tmp_path / "runs")
        d0 = make_run_dir(root)
        d1 = make_run_dir(root)
        assert d0.endswith("version_0") and d1.endswith("version_1")


class TestBuildModel:
    @pytest.mark.parametrize("name", ["siren", "hash_mlp", "rff_net", "gabor", "mlp",
                                      "modulated_siren", "freq_mlp"])
    def test_factories_get_filtered_kwargs(self, name):
        cfg = RunConfig(model_class=name, base_resolution=(8, 8, 4), finest_resolution=(16, 16, 8),
                        log2_hashmap_size=10, dim_hidden=16, n_layers=2, encoder_type="siren",
                        n_frequencies=8, n_frequencies_t=4)
        model = build_model(cfg, dim_in=3)
        assert model.dim_in == 3

    def test_psf_gets_spacing(self):
        cfg = RunConfig(model_class="psf_siren", dim_hidden=16, n_layers=2)
        model = build_model(cfg, dim_in=3, coordinates_spacing=(0.01, 0.01, 0.05))
        assert model.name == "psf_siren"


class TestEndToEnd:
    def test_full_pipeline_siren(self, tiny_volume_path, tmp_path):
        cfg = RunConfig(
            image_path=tiny_volume_path, model_class="siren", batch_size=200, epochs=5,
            lr=1e-3, dim_hidden=16, n_layers=2, zero_centered=True,
            interp_shapes=((10, 10, 11),), output_root=str(tmp_path / "runs"),
            save_checkpoint=True,
        )
        summary = run(cfg)
        rd = summary["run_dir"]
        assert os.path.exists(os.path.join(rd, "pred.nii.gz"))
        assert os.path.exists(os.path.join(rd, "interpolation(10, 10, 11).nii.gz"))
        assert os.path.exists(os.path.join(rd, "config.txt"))
        assert os.path.exists(os.path.join(rd, "metrics.json"))
        assert summary["psnr"] > 5
        interp = nifti.load(os.path.join(rd, "interpolation(10, 10, 11).nii.gz"))
        assert interp.shape == (10, 10, 11)

    def test_full_pipeline_hash_even_frames(self, tiny_volume_path, tmp_path):
        cfg = RunConfig(
            image_path=tiny_volume_path, model_class="hash_mlp", batch_size=300, epochs=5,
            lr=5e-3, dim_hidden=16, n_layers=2,
            base_resolution=(4, 4, 3), finest_resolution=(10, 10, 6), log2_hashmap_size=10,
            even_frames_only=True, interp_shapes=(), output_root=str(tmp_path / "runs"),
            save_checkpoint=False,
        )
        summary = run(cfg)
        assert "odd_psnr" in summary
        assert np.isfinite(summary["odd_psnr"])

    def test_4d_volume_rank_adaptation(self, tmp_path):
        # 4D volume + default 3-axis hash tuples: launcher must derive
        # resolutions from the volume shape and rank-adapt interp shapes.
        vol = synthetic_volume((8, 8, 3, 6), seed=2)
        path = str(tmp_path / "v4.nii.gz")
        nifti.save(vol, path)
        cfg = RunConfig(
            image_path=path, model_class="hash_mlp", batch_size=512, epochs=2,
            dim_hidden=16, n_layers=2, log2_hashmap_size=12,
            interp_shapes=((10, 10, 12),),  # wrong rank on purpose
            output_root=str(tmp_path / "runs"), save_checkpoint=False,
        )
        summary = run(cfg)
        rd = summary["run_dir"]
        # rank-adapted to (8, 8, 3, 12): volume grid + doubled time axis
        assert os.path.exists(os.path.join(rd, "interpolation(8, 8, 3, 12).nii.gz"))
        pred = nifti.load(os.path.join(rd, "pred.nii.gz"))
        assert pred.shape == (8, 8, 3, 6)

    def test_checkpoint_resume(self, tiny_volume_path, tmp_path):
        cfg = RunConfig(
            image_path=tiny_volume_path, model_class="siren", batch_size=200, epochs=2,
            dim_hidden=16, n_layers=2, zero_centered=True, interp_shapes=(),
            output_root=str(tmp_path / "runs"),
        )
        s1 = run(cfg)
        ckpt = os.path.join(s1["run_dir"], "checkpoints")
        cfg2 = configs.RunConfig(**{**cfg.__dict__, "checkpoint_path": ckpt})
        s2 = run(cfg2)
        assert s2["final_loss"] <= s1["final_loss"] * 1.5


class TestFigures:
    def test_make_figures(self, tiny_volume_path, tmp_path):
        from mri_interpolation_tpu.figures import make_figures

        cfg = RunConfig(
            image_path=tiny_volume_path, model_class="siren", batch_size=200, epochs=1,
            dim_hidden=8, n_layers=2, zero_centered=True, interp_shapes=(),
            output_root=str(tmp_path / "runs"), save_checkpoint=False,
        )
        summary = run(cfg)
        out = make_figures(summary["run_dir"])
        assert os.path.exists(out["grid"])
        assert os.path.exists(out["gif"])

    def test_figures_with_latents_and_convergence(self, tiny_volume_path, tmp_path):
        from mri_interpolation_tpu.figures import make_figures

        cfg = RunConfig(
            image_path=tiny_volume_path, model_class="hash_mlp", batch_size=200,
            epochs=2, dim_hidden=8, n_layers=2, n_levels=2, log2_hashmap_size=8,
            interp_shapes=(), output_root=str(tmp_path / "runs"),
            save_checkpoint=False, save_latents=True, eval_every_epochs=1,
        )
        summary = run(cfg)
        rd = summary["run_dir"]
        assert os.path.exists(os.path.join(rd, "latents.nii.gz"))
        from mri_interpolation_tpu.train import read_scalars

        psnrs = read_scalars(os.path.join(rd, "scalars.jsonl"), tag="psnr")
        assert len(psnrs) == 2
        out = make_figures(rd)
        assert os.path.exists(out["latents"])
        assert os.path.exists(out["convergence"])


class TestTupleFlags:
    def test_parse_tuple_flag_forms(self):
        from mri_interpolation_tpu.configs import parse_tuple_flag

        assert parse_tuple_flag("64,64,5") == (64, 64, 5)
        assert parse_tuple_flag("(64,64,5)") == (64, 64, 5)
        assert parse_tuple_flag("(352,352,30),(352,352,60)") == ((352, 352, 30), (352, 352, 60))
        assert parse_tuple_flag("[2, 4]") == (2, 4)

    def test_cli_tuple_overrides(self):
        from mri_interpolation_tpu.launcher import build_parser

        args = build_parser().parse_args([
            "--base_resolution", "8,8,4",
            "--finest_resolution", "(16,16,8)",
            "--interp_shapes", "(20,20,10)",
            "--skip_connections", "2",
        ])
        cfg = configs.override_from_args(configs.default_hash_config(), args)
        assert cfg.base_resolution == (8, 8, 4)
        assert cfg.finest_resolution == (16, 16, 8)
        assert cfg.interp_shapes == ((20, 20, 10),)   # single shape wrapped
        assert cfg.skip_connections == (2,)

    def test_cli_multi_interp_shapes(self):
        from mri_interpolation_tpu.launcher import build_parser

        args = build_parser().parse_args(["--interp_shapes", "(20,20,10),(20,20,20)"])
        cfg = configs.override_from_args(configs.default_hash_config(), args)
        assert cfg.interp_shapes == ((20, 20, 10), (20, 20, 20))


class TestJsonComments:
    def test_url_in_string_survives(self, tmp_path):
        p = tmp_path / "c.json"
        p.write_text('{\n  // a comment\n  "url": "https://x//y", // trailing\n  "n_levels": 3\n}\n')
        cfg = configs.load_json_config(str(p))
        assert cfg["url"] == "https://x//y"
        assert cfg["n_levels"] == 3

    def test_escaped_quote_in_string(self, tmp_path):
        p = tmp_path / "c.json"
        p.write_text('{"s": "a\\"b // not a comment", "k": 1} // tail\n')
        cfg = configs.load_json_config(str(p))
        assert cfg["s"] == 'a"b // not a comment'
        assert cfg["k"] == 1


class TestFiguresCli:
    def test_module_main(self, tiny_volume_path, tmp_path, capsys):
        from mri_interpolation_tpu import figures
        from mri_interpolation_tpu.io import nifti

        run_dir = tmp_path / "version_0"
        run_dir.mkdir()
        vol = np.random.default_rng(0).random((8, 8, 6), np.float32)
        nifti.save(vol, str(run_dir / "pred.nii.gz"))
        figures.main([str(run_dir), "--fps", "3"])
        outp = capsys.readouterr().out
        assert "grid:" in outp and "gif:" in outp
        assert (run_dir / "frames_grid.png").exists()
        assert (run_dir / "frames.gif").exists()


class TestWarpLauncher:
    def test_warp_even_frames_pipeline(self, tmp_path):
        """warp_inr through the full CLI pipeline with the even-frame
        protocol on a synthetic 3D volume (rank-adapted spatial resolutions)."""
        from mri_interpolation_tpu.io import nifti, synthetic_volume

        vol = synthetic_volume((14, 14, 8), seed=4)
        path = str(tmp_path / "v.nii.gz")
        nifti.save(vol, path)
        cfg = configs.default_hash_config()
        cfg.image_path = path
        cfg.model_class = "warp_inr"
        cfg.even_frames_only = True
        cfg.epochs = 3
        cfg.batch_size = 500
        cfg.n_levels = 2
        cfg.log2_hashmap_size = 10
        cfg.output_root = str(tmp_path / "runs")
        cfg.interp_shapes = ((14, 14, 16),)
        from mri_interpolation_tpu.launcher import run

        summary = run(cfg)
        assert "odd_psnr" in summary
        assert np.isfinite(summary["final_loss"])
        import os
        assert os.path.exists(os.path.join(summary["run_dir"], "pred.nii.gz"))

    def test_warp_knobs_reach_the_model(self):
        """--warp_scale/--warp_w0/--residual_scale flow config -> factory
        (the measured protocol winner must be reachable from the CLI)."""
        parser = build_parser()
        args = parser.parse_args(["--model_class", "warp_inr", "--warp_scale", "0.08",
                                  "--warp_w0", "3.0", "--residual_scale", "0.05",
                                  "--warp_hidden", "32", "--warp_layers", "2"])
        cfg = configs.override_from_args(configs.default_hash_config(), args)
        cfg.base_resolution = (4, 4)
        cfg.finest_resolution = (8, 8)
        cfg.n_levels = 2
        cfg.log2_hashmap_size = 8
        model = build_model(cfg, dim_in=3)
        assert model.name == "warp_inr"
        assert model.hparams["warp_scale"] == 0.08
        assert model.hparams["warp_w0"] == 3.0
        # residual head exists iff residual_scale > 0
        import jax
        params, _ = model.init(jax.random.key(0))
        assert "residual" in params


class TestStreamingLauncher:
    def test_streaming_single_device_pipeline(self, tiny_volume_path, tmp_path):
        cfg = RunConfig(
            image_path=tiny_volume_path, model_class="siren", batch_size=150,
            epochs=3, lr=1e-3, dim_hidden=16, n_layers=2,
            stream_shard_voxels=300, interp_shapes=(),
            output_root=str(tmp_path / "runs"), save_checkpoint=False,
        )
        summary = run(cfg)
        rd = summary["run_dir"]
        assert os.path.exists(os.path.join(rd, "pred.nii.gz"))
        assert os.path.exists(os.path.join(rd, "scalars.jsonl"))
        assert summary["psnr"] > 5

    def test_streaming_composes_with_data_parallel(self, tiny_volume_path, tmp_path):
        cfg = RunConfig(
            image_path=tiny_volume_path, model_class="siren", batch_size=160,
            epochs=2, lr=1e-3, dim_hidden=16, n_layers=2,
            stream_shard_voxels=320, data_parallel=True, interp_shapes=(),
            output_root=str(tmp_path / "runs"), save_checkpoint=False,
        )
        summary = run(cfg)
        assert summary["psnr"] > 5

    def test_streaming_rejects_even_frames(self, tiny_volume_path, tmp_path):
        cfg = RunConfig(
            image_path=tiny_volume_path, model_class="siren", batch_size=100,
            epochs=1, stream_shard_voxels=200, even_frames_only=True,
            interp_shapes=(), output_root=str(tmp_path / "runs"),
        )
        with pytest.raises(ValueError, match="stream_shard_voxels"):
            run(cfg)

    def test_anneal_rejects_shard_tables(self, tiny_volume_path, tmp_path):
        # the sharded-table trainer substitutes its distributed encode for
        # model.apply — where the anneal weighting lives — so the combination
        # must fail loudly, not silently skip the curriculum
        cfg = RunConfig(
            image_path=tiny_volume_path, model_class="hash_mlp", batch_size=100,
            epochs=1, shard_tables=True, level_anneal_steps=10,
            n_levels=2, log2_hashmap_size=8, base_resolution=(4, 4, 2),
            finest_resolution=(8, 8, 4),
            interp_shapes=(), output_root=str(tmp_path / "runs"),
        )
        with pytest.raises(ValueError, match="level_anneal_steps"):
            run(cfg)
