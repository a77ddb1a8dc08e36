"""CLI flag parity vs the reference entry point.

Extracts every ``parser.add_argument(...)`` from the reference's argparse
block (`train_dynamic_update_prune.py:703-758`) by AST, rebuilds that exact
parser, and asserts our `rick_tpu.cli.train.build_parser()` accepts the same
flags with the same dest names, coercions, and namespace defaults.  This is a
behavioral check (both parsers actually parse), not a source comparison.
"""

from __future__ import annotations

import argparse
import ast
import os

import pytest

from rick_tpu.cli.train import build_parser

REF = "/root/reference/train_dynamic_update_prune.py"

_TYPES = {"int": int, "float": float, "str": str}


def _const(node):
    """Evaluate the tiny constant-expression subset argparse defaults use."""
    if isinstance(node, ast.Constant):
        return node.value
    if isinstance(node, ast.UnaryOp) and isinstance(node.op, ast.USub):
        return -_const(node.operand)
    if isinstance(node, ast.BinOp):
        left, right = _const(node.left), _const(node.right)
        if isinstance(node.op, ast.Mult):
            return left * right
        if isinstance(node.op, ast.Add):
            return left + right
        if isinstance(node.op, ast.Sub):
            return left - right
    if isinstance(node, ast.Name) and node.id in _TYPES:
        return _TYPES[node.id]
    raise ValueError(f"unsupported default expr: {ast.dump(node)}")


def _extract_reference_flags():
    """[(args, kwargs)] for every parser.add_argument call in the reference."""
    tree = ast.parse(open(REF).read())
    out = []
    for node in ast.walk(tree):
        if not isinstance(node, ast.Call):
            continue
        func = node.func
        if not (isinstance(func, ast.Attribute) and func.attr == "add_argument"):
            continue
        if not (isinstance(func.value, ast.Name) and func.value.id == "parser"):
            continue
        args = [_const(a) for a in node.args]
        kwargs = {kw.arg: _const(kw.value) for kw in node.keywords if kw.arg != "help"}
        out.append((args, kwargs))
    return out


@pytest.fixture(scope="module")
def ref_spec():
    if not os.path.exists(REF):
        pytest.skip("reference tree not available")
    spec = _extract_reference_flags()
    assert len(spec) >= 40, f"expected ~45 reference flags, AST found {len(spec)}"
    return spec


@pytest.fixture(scope="module")
def ref_parser(ref_spec):
    p = argparse.ArgumentParser()
    for args, kwargs in ref_spec:
        p.add_argument(*args, **kwargs)
    return p


def test_every_reference_flag_exists_with_same_default(ref_spec, ref_parser):
    ours = build_parser()
    ref_ns = vars(ref_parser.parse_args([]))
    our_ns = vars(ours.parse_args([]))
    missing = [k for k in ref_ns if k not in our_ns]
    assert not missing, f"reference dests missing from rick-tpu CLI: {missing}"
    diffs = {
        k: (ref_ns[k], our_ns[k]) for k in ref_ns if our_ns[k] != ref_ns[k]
    }
    assert not diffs, f"default mismatches (ref, ours): {diffs}"


def test_value_coercion_matches(ref_spec):
    """Parsing the same CLI tokens produces identical typed values."""
    ours = build_parser()
    probe = []
    for args, kwargs in ref_spec:
        flag = args[0]
        if "action" in kwargs:  # store_true / store_false take no value
            probe.append(flag)
        else:
            typ = kwargs.get("type", str)
            probe += [flag, {int: "7", float: "0.25", str: "probe"}[typ]]
    ref_p = argparse.ArgumentParser()
    for args, kwargs in ref_spec:
        ref_p.add_argument(*args, **kwargs)
    ref_ns = vars(ref_p.parse_args(probe))
    our_ns = vars(ours.parse_args(probe))
    for k, v in ref_ns.items():
        assert our_ns[k] == v and type(our_ns[k]) is type(v), (
            f"{k}: ref {v!r} ({type(v).__name__}) vs ours "
            f"{our_ns[k]!r} ({type(our_ns[k]).__name__})"
        )


def test_readme_recipe_commands_parse():
    """The reference README's two training recipes parse verbatim.

    Flags from `README.md:95-102` (FFHQ->Babies) and `:107-114` (AFHQ-Cat);
    the second README command's `.py.py` typo is on the script name, not the
    flags, so the flag list itself must parse.
    """
    ours = build_parser()
    babies = (
        "--exp babies --data_path babies --iter 1750 --batch 2 --augment "
        "--fisher_freq 50 --warmup_iter 250 --fisher_quantile 40 "
        "--prune_quantile 0.1 --num_fisher_img 5 --eval_in_training "
        "--eval_in_training_freq 50 --n_sample_test 5000 "
        "--store_samples --store_checkpoints"
    ).split()
    cat = (
        "--exp cat --data_path afhq_cat --iter 2250 --batch 2 --augment "
        "--fisher_freq 50 --warmup_iter 250 --fisher_quantile 85 "
        "--prune_quantile 0.075 --num_fisher_img 5 --eval_in_training "
        "--eval_in_training_freq 50 --n_sample_test 5000 "
        "--store_samples --store_checkpoints"
    ).split()
    a = ours.parse_args(babies)
    assert a.iter == 1750 and a.fisher_quantile == 40 and a.augment
    b = ours.parse_args(cat)
    assert b.iter == 2250 and b.prune_quantile == 0.075


def test_real_cache_fingerprint_and_eviction(tmp_path):
    """ADVICE r3: the real-set cache key fingerprints dataset content (a
    rebuilt store invalidates the cache) and stale keys are evictable."""
    from rick_tpu.cli.train import _dataset_fingerprint, _evict_stale_real_caches

    ds = tmp_path / "ds"
    ds.mkdir()
    rec = ds / "records.rdb"
    rec.write_bytes(b"a" * 100)
    os.utime(rec, ns=(1_000_000_000, 1_000_000_000))
    fp1 = _dataset_fingerprint(str(ds))
    # same content, same stamp -> stable key
    assert _dataset_fingerprint(str(ds)) == fp1
    # rebuilt store (different size or mtime) -> different key
    rec.write_bytes(b"b" * 101)
    os.utime(rec, ns=(2_000_000_000, 2_000_000_000))
    assert _dataset_fingerprint(str(ds)) != fp1
    # plain image dir fallback changes when a file is added
    imgdir = tmp_path / "imgs"
    imgdir.mkdir()
    (imgdir / "a.png").write_bytes(b"x")
    fp_dir = _dataset_fingerprint(str(imgdir))
    (imgdir / "b.png").write_bytes(b"y")
    assert _dataset_fingerprint(str(imgdir)) != fp_dir

    cache = tmp_path / "_cache"
    cache.mkdir()
    keep = cache / "real_imgs_k1.npy"
    stale = cache / "real_imgs_old.npy"
    stale_acts = cache / "real_acts_old.npy"
    other = cache / "unrelated.txt"
    for f in (keep, stale, stale_acts, other):
        f.write_bytes(b"z")
    _evict_stale_real_caches(str(cache), [str(keep)])
    assert keep.exists() and other.exists()
    assert not stale.exists() and not stale_acts.exists()


def test_cache_key_sanitizes_path_separators(tmp_path):
    """A data_path like 'ffhq/train' must not create cache paths pointing
    into nonexistent subdirectories (ADVICE r3)."""
    from rick_tpu.cli.train import _real_cache_paths

    args = build_parser().parse_args(["--data_path", "ffhq/train"])
    imgs, acts = _real_cache_paths(args, str(tmp_path), str(tmp_path / "_cache"))
    # both paths are direct children of the cache dir
    for p in (imgs, acts):
        assert os.path.dirname(p) == str(tmp_path / "_cache")
        assert "ffhq_train" in os.path.basename(p)
