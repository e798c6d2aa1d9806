# Copyright 2026 The sentencepiece-tpu Authors.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
"""CLI layer (reference src/spm_*_main.cc, src/flags.{h,cc}).

Five tools matching the reference binaries flag-for-flag:
spm_train / spm_encode / spm_decode / spm_normalize / spm_export_vocab,
invocable as ``python -m sentencepiece_tpu.cli.spm_train --...`` or through
the console helpers in setup.py.
"""

from typing import Dict, List, Tuple


class Flags:
    """Minimal --k=v / --k v parser with the reference's semantics
    (flags.cc:276-: '--help', '--version', bool sugar, rest args)."""

    def __init__(self, spec: Dict[str, Tuple[str, object, str]],
                 prog: str, version: str = "0.1.82-tpu"):
        # spec: name -> (type, default, help); type in {s,i,f,b}
        self.spec = spec
        self.prog = prog
        self.version = version
        self.values = {k: v[1] for k, v in spec.items()}
        self.rest: List[str] = []

    def usage(self) -> str:
        lines = [f"{self.prog} (sentencepiece-tpu) {self.version}", "",
                 f"Usage: {self.prog} [options] files", ""]
        for name, (t, default, help_) in self.spec.items():
            tname = {"s": "string", "i": "int32",
                     "f": "double", "b": "bool"}[t]
            lines.append(f"   --{name} ({help_})  type: {tname}  "
                         f"default: {default}")
        return "\n".join(lines)

    def parse(self, argv: List[str]) -> None:
        i = 0
        while i < len(argv):
            arg = argv[i]
            i += 1
            if not arg.startswith("--"):
                self.rest.append(arg)
                continue
            body = arg[2:]
            if "=" in body:
                key, value = body.split("=", 1)
            else:
                key, value = body, None
            if key in ("help", "h"):
                print(self.usage())
                raise SystemExit(0)
            if key == "version":
                print(f"{self.prog} (sentencepiece-tpu) {self.version}")
                raise SystemExit(0)
            if key == "minloglevel":
                if value is None:
                    value, i = argv[i], i + 1
                import logging
                lvl = [logging.INFO, logging.WARNING, logging.ERROR,
                       logging.CRITICAL][min(max(int(value), 0), 3)]
                logging.getLogger("sentencepiece_tpu").setLevel(lvl)
                continue
            if key not in self.spec:
                raise SystemExit(f"ERROR: unknown option --{key}\n\n"
                                 + self.usage())
            t = self.spec[key][0]
            if value is None:
                if t == "b":
                    value = "true"
                else:
                    if i >= len(argv):
                        raise SystemExit(f"ERROR: --{key} requires a value")
                    value, i = argv[i], i + 1
            if t == "s":
                self.values[key] = value
            elif t == "i":
                self.values[key] = int(value)
            elif t == "f":
                self.values[key] = float(value)
            elif t == "b":
                lv = value.lower()
                if lv in ("1", "t", "true", ""):
                    self.values[key] = True
                elif lv in ("0", "f", "false"):
                    self.values[key] = False
                else:
                    raise SystemExit(f"ERROR: cannot parse {value} as bool")

    def __getattr__(self, name: str):
        try:
            return self.values[name]
        except KeyError:
            raise AttributeError(name)


def open_output(path: str):
    """'' => stdout (reference filesystem.cc WritableFile semantics)."""
    import sys
    if not path:
        return sys.stdout
    return open(path, "w", encoding="utf-8", errors="surrogateescape",
                newline="\n")


def read_lines(filenames: List[str]):
    """Yield lines from files ('' or none => stdin), splitting on \\n only
    (reference ReadLine keeps \\r as content)."""
    import sys
    if not filenames:
        filenames = [""]
    for fname in filenames:
        if fname == "":
            data = sys.stdin.buffer.read()
        else:
            with open(fname, "rb") as f:
                data = f.read()
        lines = data.split(b"\n")
        if lines and lines[-1] == b"":
            lines.pop()
        for line in lines:
            yield line.decode("utf-8", errors="surrogateescape")
