"""TrainConfig JSON loader + train-CLI override semantics (SURVEY.md §5.6:
the reference is argparse-only, apps/train_main.cpp; the config-file layer is
additive here)."""
import json

import pytest

from tpugs.train.trainer import (
    TrainConfig,
    load_train_config,
    train_config_from_dict,
)


class TestConfigDict:
    def test_flat_fields(self):
        cfg = train_config_from_dict({"iterations": 500, "tile_h": 16})
        assert cfg.iterations == 500
        assert cfg.tile_h == 16
        assert cfg.tile_w == TrainConfig().tile_w  # untouched default

    def test_nested_sections(self):
        cfg = train_config_from_dict({
            "densify_mode": "mcmc",
            "adam": {"position_lr": 1e-3},
            "adc": {"densify_every": 200},
            "mcmc": {"relocate_every": 50},
        })
        assert cfg.adam.position_lr == 1e-3
        assert cfg.adc.densify_every == 200
        assert cfg.mcmc.relocate_every == 50

    def test_unknown_key_raises(self):
        with pytest.raises(ValueError, match="unknown keys.*iteratons"):
            train_config_from_dict({"iteratons": 500})

    def test_unknown_nested_key_raises(self):
        with pytest.raises(ValueError, match="adc.*unknown keys"):
            train_config_from_dict({"adc": {"densify_evry": 5}})

    def test_load_file(self, tmp_path):
        path = tmp_path / "cfg.json"
        path.write_text(json.dumps({"iterations": 77, "seed": 9}))
        cfg = load_train_config(str(path))
        assert cfg.iterations == 77 and cfg.seed == 9


class TestCliOverrides:
    def _cfg(self, argv):
        from tpugs.apps.train import _given_args, build_parser, config_from_args

        args = build_parser().parse_args(argv)
        return config_from_args(args, _given_args(argv))

    def test_no_config_matches_defaults(self):
        cfg = self._cfg(["-d", "x"])
        assert cfg == TrainConfig()

    def test_cli_only(self):
        cfg = self._cfg(["-d", "x", "-i", "123", "--mcmc", "--tile", "16"])
        assert cfg.iterations == 123
        assert cfg.densify_mode == "mcmc"
        assert cfg.tile_h == cfg.tile_w == 16

    def test_config_file_base(self, tmp_path):
        path = tmp_path / "c.json"
        path.write_text(json.dumps(
            {"iterations": 777, "seed": 3, "adc": {"densify_every": 250}}
        ))
        cfg = self._cfg(["-d", "x", "-c", str(path)])
        assert cfg.iterations == 777 and cfg.seed == 3
        assert cfg.adc.densify_every == 250

    def test_cli_flag_overrides_config(self, tmp_path):
        path = tmp_path / "c.json"
        path.write_text(json.dumps({"iterations": 777, "seed": 3}))
        cfg = self._cfg(["-d", "x", "-c", str(path), "-i", "42"])
        assert cfg.iterations == 42  # explicit flag wins
        assert cfg.seed == 3  # non-passed flag does NOT reset to default

    def test_default_value_does_not_override(self, tmp_path):
        """A config value differing from the CLI default survives when the
        flag is not passed (the SUPPRESS-parse given-set semantics)."""
        path = tmp_path / "c.json"
        path.write_text(json.dumps({"tile_h": 16, "tile_w": 16}))
        cfg = self._cfg(["-d", "x", "-c", str(path)])
        assert cfg.tile_h == 16 and cfg.tile_w == 16
