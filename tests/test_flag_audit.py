"""Flag-surface honesty audit (VERDICT round-1 task 5).

Every flag config_parser accepts must either (a) have a read site in the
package source (args.<name> / getattr(args, "<name>")) or (b) be declared
in IGNORED_FLAGS so warn_ignored_flags() warns when a user sets it.
Silently-accepted-and-ignored flags are a bug.
"""
import os
import re

from cfnerf_tpu.utils.config import (
    IGNORED_FLAGS,
    config_parser,
    warn_ignored_flags,
)

PKG = os.path.join(os.path.dirname(__file__), "..", "cfnerf_tpu")


def _package_source() -> str:
    chunks = []
    for root, _, files in os.walk(PKG):
        for f in files:
            if f.endswith(".py"):
                chunks.append(open(os.path.join(root, f)).read())
    return "\n".join(chunks)


def test_every_flag_used_or_warned():
    src = _package_source()
    parser = config_parser()
    missing = []
    for action in parser._actions:
        dest = action.dest
        if dest in ("help", "config"):
            continue
        used = (
            re.search(rf"args\.{dest}\b", src)
            or re.search(rf"getattr\(args,\s*[\"']{dest}[\"']", src)
            or re.search(rf"a\.{dest}\b", src)  # ensemble's _member_args
        )
        if not used and dest not in IGNORED_FLAGS:
            missing.append(dest)
    assert not missing, (
        f"flags accepted but neither read nor declared ignored: {missing}"
    )


def test_ignored_flags_warn(capsys):
    args = config_parser().parse_args(["--beta_u", "0.7", "--z_size", "5"])
    warned = warn_ignored_flags(args)
    err = capsys.readouterr().err
    assert set(warned) == {"beta_u", "z_size"}
    assert "--beta_u" in err and "--z_size" in err


def test_defaults_do_not_warn(capsys):
    args = config_parser().parse_args([])
    assert warn_ignored_flags(args) == []
    assert capsys.readouterr().err == ""
