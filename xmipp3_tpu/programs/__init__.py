"""CLI program endpoints (the xmipp_<name> surface).

`main()` is the single dispatcher: `xmipp <program> [args...]` or, when invoked
through a symlink/alias named `xmipp_<program>`, dispatches on argv[0] — the
same public surface as the reference's 209 binaries
(/root/reference/src/xmipp/applications/programs/CMakeLists.txt:31-60).
"""
from __future__ import annotations

import os
import sys

_REGISTRY: dict[str, str] = {}  # program name -> module path


def register(name: str, module: str) -> None:
    _REGISTRY[name] = module


def get_program(name: str):
    """Instantiate a program class by CLI name (lazy import).

    Registry values are "module.path" (uses module PROGRAM attr) or
    "module.path:ClassName"."""
    import importlib

    _populate()
    if name not in _REGISTRY:
        return None
    target = _REGISTRY[name]
    if ":" in target:
        modname, clsname = target.split(":", 1)
        mod = importlib.import_module(modname)
        return getattr(mod, clsname)()
    mod = importlib.import_module(target)
    return mod.PROGRAM()


def list_programs() -> list[str]:
    _populate()
    return sorted(_REGISTRY)


_POPULATED = False


def _populate() -> None:
    global _POPULATED
    if _POPULATED:
        return
    _POPULATED = True
    from xmipp3_tpu.programs import registry  # noqa: F401  (fills _REGISTRY)


def main(argv=None) -> int:
    argv = list(sys.argv if argv is None else argv)
    prog = os.path.basename(argv[0])
    if prog.startswith("xmipp_"):
        name, args = prog[len("xmipp_"):], argv[1:]
    else:
        if len(argv) < 2 or argv[1] in ("-h", "--help"):
            print("Usage: xmipp <program> [options]\n\nAvailable programs:")
            for p in list_programs():
                print(f"  xmipp_{p}")
            return 0
        name, args = argv[1], argv[2:]
        if name.startswith("xmipp_"):
            name = name[len("xmipp_"):]
    program = get_program(name)
    if program is None:
        print(f"xmipp: unknown program '{name}' (try 'xmipp --help')",
              file=sys.stderr)
        return 1
    from xmipp3_tpu.core.errors import XmippError
    try:
        program.read(["xmipp_" + name] + args)
    except XmippError as e:
        print(f"XMIPP_ERROR: {e}\nRun 'xmipp_{name} --help' for usage.",
              file=sys.stderr)
        return 1
    return program.tryRun()


if __name__ == "__main__":
    raise SystemExit(main())
