"""CLI argument-layer smoke tests (drivers' heavy paths are covered by
pipeline/nerf/reader integration tests)."""
import numpy as np
import pytest


class TestArgParsing:
    def test_convert_weights_requires_a_ckpt(self, tmp_path):
        from foundationpose_tpu.cli.convert_weights import main

        with pytest.raises(SystemExit):
            main(["--out_dir", str(tmp_path)])

    def test_run_nerf_rejects_bad_preset(self):
        from foundationpose_tpu.cli.run_nerf import main

        with pytest.raises(SystemExit):
            main(["--ref_view_dir", "x", "--preset", "bogus"])

    def test_run_bop_rejects_bad_dataset(self):
        from foundationpose_tpu.cli.run_bop import main

        with pytest.raises(SystemExit):
            main(["--dataset", "not-a-dataset"])

    def test_all_cli_modules_import(self):
        import foundationpose_tpu.cli.convert_weights
        import foundationpose_tpu.cli.run_bop
        import foundationpose_tpu.cli.run_demo
        import foundationpose_tpu.cli.run_linemod
        import foundationpose_tpu.cli.run_multi_demo
        import foundationpose_tpu.cli.run_nerf
        import foundationpose_tpu.cli.run_ycb_video

    def test_run_multi_demo_rejects_mismatched_lists(self):
        from foundationpose_tpu.cli.run_multi_demo import main

        with pytest.raises(SystemExit):
            main([
                "--mesh_files", "a.obj,b.obj",
                "--mask_files", "a.png",
                "--test_scene_dir", "x",
            ])
