"""--config file support and run-provenance recording (cli/main.py).

The reference's only run configuration is argparse + buried module
constants (SURVEY §5); this framework adds a JSON config layer with
strict precedence (command line > config file > built-in defaults) and
records every run's resolved flags next to its artifacts."""

import json
import os
import types

import pytest

from image_captioning_through_rl_tpu.cli.main import (
    _record_run_config,
    build_arg_parser,
    parse_args_with_config,
)


def _write_cfg(tmp_path, obj, name="cfg.json"):
    p = tmp_path / name
    p.write_text(json.dumps(obj))
    return str(p)


def test_config_sets_defaults_cli_wins(tmp_path):
    cfg = _write_cfg(tmp_path, {"epochs": 7, "batch_size": 16,
                                "curriculum": True, "seed": 3})
    ns = parse_args_with_config(build_arg_parser(), ["--config", cfg])
    assert (ns.epochs, ns.batch_size, ns.curriculum, ns.seed) == (7, 16, True, 3)
    # explicit command-line flags beat the file
    ns = parse_args_with_config(
        build_arg_parser(), ["--config", cfg, "--epochs", "2"])
    assert ns.epochs == 2 and ns.batch_size == 16


def test_config_true_boolean_overridable_with_no_flag(tmp_path):
    """A config file setting a boolean true must still lose to an
    explicit command-line negation (--no-curriculum etc.) — every
    boolean on the main parser is a BooleanOptionalAction for exactly
    this."""
    cfg = _write_cfg(tmp_path, {"curriculum": True, "resume": True})
    ns = parse_args_with_config(build_arg_parser(),
                                ["--config", cfg, "--no-curriculum"])
    assert ns.curriculum is False and ns.resume is True


def test_config_unknown_key_rejected(tmp_path):
    cfg = _write_cfg(tmp_path, {"epocs": 7})
    with pytest.raises(SystemExit):
        parse_args_with_config(build_arg_parser(), ["--config", cfg])


def test_config_type_and_choices_validation(tmp_path):
    # store_true flags must be JSON booleans, not truthy strings
    with pytest.raises(SystemExit):
        parse_args_with_config(build_arg_parser(), [
            "--config", _write_cfg(tmp_path, {"curriculum": "yes"}, "a.json")])
    # typed values coerce ("8" -> 8), garbage errors
    ns = parse_args_with_config(build_arg_parser(), [
        "--config", _write_cfg(tmp_path, {"epochs": "8"}, "b.json")])
    assert ns.epochs == 8
    with pytest.raises(SystemExit):
        parse_args_with_config(build_arg_parser(), [
            "--config", _write_cfg(tmp_path, {"epochs": "lots"}, "c.json")])
    # choices enforced
    with pytest.raises(SystemExit):
        parse_args_with_config(build_arg_parser(), [
            "--config", _write_cfg(tmp_path, {"train_word2vec": "bert"},
                                   "d.json")])


def test_config_must_be_object(tmp_path):
    with pytest.raises(SystemExit):
        parse_args_with_config(build_arg_parser(), [
            "--config", _write_cfg(tmp_path, [1, 2, 3])])
    bad = tmp_path / "bad.json"
    bad.write_text("{not json")
    with pytest.raises(SystemExit):
        parse_args_with_config(build_arg_parser(), ["--config", str(bad)])


def test_run_config_written_and_replays(tmp_path):
    args = parse_args_with_config(build_arg_parser(),
                                  ["--epochs", "4", "--faithful_beam"])
    _record_run_config(args, str(tmp_path))
    path = tmp_path / "run_config.json"
    recorded = json.loads(path.read_text())
    assert recorded["epochs"] == 4 and recorded["faithful_beam"] is True
    assert "config" not in recorded  # no self-reference

    # replaying the recorded file reproduces the exact namespace
    replayed = parse_args_with_config(build_arg_parser(),
                                      ["--config", str(path)])
    orig = {k: v for k, v in vars(args).items() if k != "config"}
    again = {k: v for k, v in vars(replayed).items() if k != "config"}
    assert orig == again


def test_eval_run_does_not_clobber_training_provenance(tmp_path):
    """--test_model reuses the original log dir (reference rule) — its
    flag record must land in eval_config.json, not overwrite the
    training run's run_config.json."""
    train_dir = tmp_path / "logs_ts"
    train_dir.mkdir()
    (train_dir / "run_config.json").write_text('{"epochs": 99}\n')
    model = train_dir / "a2cNetwork.ckpt"
    model.write_bytes(b"x")

    args = parse_args_with_config(build_arg_parser(),
                                  ["--test_model", str(model)])
    _record_run_config(args, str(train_dir))
    assert json.loads((train_dir / "run_config.json").read_text()) == {
        "epochs": 99}
    assert json.loads((train_dir / "eval_config.json").read_text())[
        "test_model"] == str(model)


def test_nonmain_process_writes_nothing(tmp_path, monkeypatch):
    import image_captioning_through_rl_tpu.cli.main as cli_main

    monkeypatch.setattr("image_captioning_through_rl_tpu.parallel."
                        "is_main_process", lambda: False)
    args = parse_args_with_config(build_arg_parser(), [])
    _record_run_config(args, str(tmp_path))
    assert not os.path.exists(tmp_path / "run_config.json")
