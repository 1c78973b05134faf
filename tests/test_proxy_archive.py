"""The live-run tracked-archive mirror (scripts/run_accuracy_proxy.archive_run).

Round-4 lesson: the pre-registered run R's eval curve was lost because
`.proxy_runs/` is gitignored and the container fs is ephemeral — the
end-of-round auto-commit had nothing tracked to capture. The mirror copies a
run's metrics.json/config.yaml into docs/proxy_runs/<name>/ while the run is
live; these tests pin its contract (idempotence, partial runs, atomicity).
"""

import importlib.util
import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

spec = importlib.util.spec_from_file_location(
    "run_accuracy_proxy", os.path.join(REPO, "scripts", "run_accuracy_proxy.py"))
rap = importlib.util.module_from_spec(spec)
spec.loader.exec_module(rap)


def _mk_run(tmp_path, name, with_config=True):
    out = tmp_path / "runs" / name
    out.mkdir(parents=True)
    (out / "metrics.json").write_text(
        json.dumps({"iteration": 250, "mAP50": 55.0}) + "\n")
    if with_config:
        (out / "config.yaml").write_text("SEED: 101\n")
    return out


def test_archive_mirrors_metrics_and_config(tmp_path):
    out = _mk_run(tmp_path, "run_x")
    root = tmp_path / "archive"
    dst = rap.archive_run(str(out), archive_root=str(root))
    assert dst == str(root / "run_x")
    assert json.loads((root / "run_x" / "metrics.json").read_text().strip())[
        "iteration"] == 250
    assert (root / "run_x" / "config.yaml").read_text() == "SEED: 101\n"


def test_archive_picks_up_appended_rows(tmp_path):
    out = _mk_run(tmp_path, "run_x")
    root = tmp_path / "archive"
    rap.archive_run(str(out), archive_root=str(root))
    with open(out / "metrics.json", "a") as f:
        f.write(json.dumps({"iteration": 500, "mAP50": 61.2}) + "\n")
    rap.archive_run(str(out), archive_root=str(root))
    rows = [json.loads(ln) for ln in
            (root / "run_x" / "metrics.json").read_text().splitlines()]
    assert [r["iteration"] for r in rows] == [250, 500]


def test_archive_unchanged_run_does_not_rewrite(tmp_path):
    out = _mk_run(tmp_path, "run_x")
    root = tmp_path / "archive"
    rap.archive_run(str(out), archive_root=str(root))
    dst = root / "run_x" / "metrics.json"
    before = dst.stat().st_mtime_ns
    rap.archive_run(str(out), archive_root=str(root))
    assert dst.stat().st_mtime_ns == before  # content-equal -> no write


def test_archive_before_first_metric_is_a_noop(tmp_path):
    out = tmp_path / "runs" / "run_y"
    out.mkdir(parents=True)  # train_net hasn't written anything yet
    root = tmp_path / "archive"
    assert rap.archive_run(str(out), archive_root=str(root)) is None
    assert not (root / "run_y").exists()


def test_archive_partial_run_copies_what_exists(tmp_path):
    out = _mk_run(tmp_path, "run_z", with_config=False)
    root = tmp_path / "archive"
    dst = rap.archive_run(str(out), archive_root=str(root))
    assert dst == str(root / "run_z")
    assert (root / "run_z" / "metrics.json").exists()
    assert not (root / "run_z" / "config.yaml").exists()


def test_archive_leaves_no_tmp_files(tmp_path):
    out = _mk_run(tmp_path, "run_x")
    root = tmp_path / "archive"
    rap.archive_run(str(out), archive_root=str(root))
    assert not [p for p in (root / "run_x").iterdir() if p.name.endswith(".tmp")]


def test_archive_drops_torn_trailing_line(tmp_path):
    # a mirror tick can race train_net mid-append; the archived copy must end
    # at the last complete JSONL line (ADVICE r4)
    out = _mk_run(tmp_path, "run_x")
    root = tmp_path / "archive"
    with open(out / "metrics.json", "a") as f:
        f.write('{"iteration": 500, "mAP')  # torn: no trailing newline
    rap.archive_run(str(out), archive_root=str(root))
    text = (root / "run_x" / "metrics.json").read_text()
    rows = [json.loads(ln) for ln in text.splitlines()]  # all lines parse
    assert [r["iteration"] for r in rows] == [250]
    assert text.endswith("\n")


def test_archive_refuses_to_shrink_rotates_prior_curve(tmp_path):
    # rerunning under the same --out name must not destroy the longer
    # uncommitted prior curve: it is rotated to a numbered suffix (ADVICE r4)
    out = _mk_run(tmp_path, "run_x")
    root = tmp_path / "archive"
    with open(out / "metrics.json", "a") as f:
        f.write(json.dumps({"iteration": 500, "mAP50": 61.2}) + "\n")
    rap.archive_run(str(out), archive_root=str(root))
    # fresh run reuses the name: near-empty metrics.json
    (out / "metrics.json").write_text(json.dumps({"iteration": 20}) + "\n")
    rap.archive_run(str(out), archive_root=str(root))
    cur = [json.loads(ln) for ln in
           (root / "run_x" / "metrics.json").read_text().splitlines()]
    prior = [json.loads(ln) for ln in
             (root / "run_x" / "metrics.json.1").read_text().splitlines()]
    assert [r["iteration"] for r in cur] == [20]
    assert [r["iteration"] for r in prior] == [250, 500]
