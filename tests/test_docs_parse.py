"""Every documented CLI command must parse against the real parsers.

Round-2 VERDICT found docs/REPRODUCE.md documenting flags cli.evaluate did
not have -- the single most important documented workflow did not run as
written.  This test extracts every ```bash block from the docs (and the
README), resolves shell variables, and runs each
``python -m voxsrc2020_speaker_verification_tpu.cli.X ...`` command through
that module's ``build_parser()``.  Parsing only -- nothing executes.
"""

import importlib
import os
import re
import shlex

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DOCS = [
    os.path.join(REPO, "docs", "REPRODUCE.md"),
    os.path.join(REPO, "README.md"),
]
PKG = "voxsrc2020_speaker_verification_tpu"


def bash_blocks(path):
    text = open(path).read()
    return re.findall(r"```(?:bash|sh)\n(.*?)```", text, re.DOTALL)


def shell_commands(block):
    """Resolve VAR="..." assignments and $VAR references, join backslash
    continuations, drop comments -> list of argv lists."""
    variables = {}
    # join continuations
    block = block.replace("\\\n", " ")
    cmds = []
    for line in block.splitlines():
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        m = re.match(r'^([A-Za-z_][A-Za-z0-9_]*)="([^"]*)"$', line)
        if m:
            variables[m.group(1)] = m.group(2)
            continue

        def sub(match):
            name = match.group(1)
            # unknown vars ($DATA, $i, $N...) -> "1": a valid path fragment
            # AND a valid int, so type=int flags parse too
            return variables.get(name, "1")

        line = re.sub(r"\$\{?([A-Za-z_][A-Za-z0-9_]*)\}?", sub, line)
        line = line.split("#")[0].strip()
        # strip pipe tails (none documented today, but keep this robust)
        line = line.split("|")[0].strip()
        try:
            argv = shlex.split(line)
        except ValueError:
            continue
        if argv:
            cmds.append(argv)
    return cmds


def collect_cli_commands():
    out = []
    for doc in DOCS:
        if not os.path.exists(doc):
            continue
        for block in bash_blocks(doc):
            for argv in shell_commands(block):
                if (len(argv) >= 3 and argv[0].startswith("python")
                        and argv[1] == "-m"
                        and argv[2].startswith(f"{PKG}.cli.")):
                    out.append((os.path.basename(doc), argv[2], argv[3:]))
    return out


COMMANDS = collect_cli_commands()


def test_docs_contain_cli_commands():
    """The extraction itself must keep working: the REPRODUCE doc documents
    at least prepare_data, train and evaluate invocations."""
    modules = {m for _, m, _ in COMMANDS}
    assert f"{PKG}.cli.prepare_data" in modules
    assert f"{PKG}.cli.train" in modules
    assert f"{PKG}.cli.evaluate" in modules


@pytest.mark.parametrize(
    "doc,module,args", COMMANDS,
    ids=[f"{d}:{m.split('.')[-1]}:{i}"
         for i, (d, m, _) in enumerate(COMMANDS)])
def test_documented_command_parses(doc, module, args):
    mod = importlib.import_module(module)
    parser = mod.build_parser()
    if module.endswith(".launch") and "--" in args:
        # launch forwards everything after -- to cli.train on each process
        split = args.index("--")
        own, fwd = args[:split], args[split + 1:]
        parser.parse_args(own)
        train = importlib.import_module(f"{PKG}.cli.train")
        train.build_parser().parse_args(fwd)
    else:
        parser.parse_args(args)
