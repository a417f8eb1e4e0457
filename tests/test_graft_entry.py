"""Graft driver surface: the tunnel-proofing contracts (VERDICT r4 item 1).

The expensive end-to-end paths (entry() compile, dryrun_multichip on 8
virtual devices) are exercised by the driver itself and by
tests/test_parallel.py; these tests pin the cheap host-side logic that
keeps the surface safe when the axon tunnel is dead:

* importing the module must not import jax (a dead tunnel makes any
  backend init block forever),
* the re-exec decision must come from env vars alone,
* the forced-CPU child must not inherit axon-plugin site dirs on
  PYTHONPATH (their sitecustomize hangs jax import on a dead tunnel).
"""

import ast
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __graft_entry__ as ge


def test_module_has_no_toplevel_jax_import():
    with open(os.path.join(REPO, "__graft_entry__.py")) as f:
        tree = ast.parse(f.read())
    for node in tree.body:  # top level only; function bodies may import
        if isinstance(node, ast.Import):
            assert not any(a.name.split(".")[0] == "jax"
                           for a in node.names)
        if isinstance(node, ast.ImportFrom):
            assert (node.module or "").split(".")[0] != "jax"


def test_forced_cpu_device_count_reads_env_only(monkeypatch):
    monkeypatch.delenv("JAX_PLATFORMS", raising=False)
    monkeypatch.delenv("JAX_PLATFORM_NAME", raising=False)
    monkeypatch.delenv("XLA_FLAGS", raising=False)
    assert ge._forced_cpu_device_count() == 0  # no forced platform

    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    assert ge._forced_cpu_device_count() == 1  # cpu, default topology

    monkeypatch.setenv(
        "XLA_FLAGS", "--foo --xla_force_host_platform_device_count=8"
    )
    assert ge._forced_cpu_device_count() == 8

    monkeypatch.setenv("JAX_PLATFORMS", "tpu")
    assert ge._forced_cpu_device_count() == 0  # non-cpu never runs in-proc


def test_strip_axon_site_drops_plugin_dirs():
    pp = os.pathsep.join(
        ["/root/repo", "/root/.axon_site", "/usr/lib/x", "/opt/axon_site/",
         "/home/user/taxonomy"]  # contains 'axon' but is NOT a plugin dir
    )
    out = ge._strip_axon_site(pp).split(os.pathsep)
    assert "/root/repo" in out and "/usr/lib/x" in out
    assert "/home/user/taxonomy" in out  # exact-name match, not substring
    assert not any(p.rstrip("/").endswith(("axon_site", ".axon_site"))
                   for p in out)
    assert ge._strip_axon_site("") == ""


def test_forced_cpu_device_count_uses_last_flag_occurrence(monkeypatch):
    """XLA honors the LAST repeated flag; _reexec_dryrun appends, so
    duplicates are the norm, not the exception."""
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    monkeypatch.setenv(
        "XLA_FLAGS",
        "--xla_force_host_platform_device_count=16 "
        "--xla_force_host_platform_device_count=4",
    )
    assert ge._forced_cpu_device_count() == 4
