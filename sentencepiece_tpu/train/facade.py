# Copyright 2026 The sentencepiece-tpu Authors.
#
# Licensed under the Apache License, Version 2.0 (the "License");
# you may not use this file except in compliance with the License.
"""Trainer facade (reference src/sentencepiece_trainer.{h,cc} + generated
src/spec_parser.h).

``SentencePieceTrainer.Train("--input=x --model_prefix=m ...")`` parses the
flag string via field-name reflection over TrainerSpec/NormalizerSpec
(spec_parser.h:97,384 SetProtoField), compiles/looks up the normalizer
charsmap (sentencepiece_trainer.cc:163-188), and dispatches to the model
trainer (trainer_factory.cc:34).
"""

from __future__ import annotations

import logging
from typing import Dict, Optional, Type

from ..normalizer import builder, charsmap as charsmap_lib
from ..proto.spec import ModelType, NormalizerSpec, TrainerSpec, ModelProto
from ..proto.wire import K_BOOL, K_ENUM, K_FLOAT, K_INT32, K_STRING
from . import bpe, char, unigram, word
from .interface import TrainerInterface

log = logging.getLogger("sentencepiece_tpu.train")

_malloc_tuned = False


def _tune_malloc() -> None:
    """Keep corpus-scale buffers in the heap instead of per-allocation
    mmaps. glibc mmaps every block over the mmap threshold and munmaps it
    on free, so each corpus-sized numpy temporary pays a fresh page-fault
    + zeroing storm (measured ~0.55 s per 100 MB on this host class;
    faults are paid once per heap high-water mark after this). This is
    the reference README's tcmalloc recommendation ("10-40% performance
    improvement"), applied in-process at trainer start. Opt out with
    SPM_MALLOC_TUNE=0."""
    global _malloc_tuned
    if _malloc_tuned:
        return
    _malloc_tuned = True
    import os
    if os.environ.get("SPM_MALLOC_TUNE", "1") == "0":
        return
    try:
        import ctypes
        libc = ctypes.CDLL("libc.so.6")
        libc.mallopt(-3, 1 << 30)  # M_MMAP_THRESHOLD
        libc.mallopt(-1, 1 << 30)  # M_TRIM_THRESHOLD
    except Exception:  # noqa: BLE001 - non-glibc platforms: no-op
        pass

DEFAULT_NORMALIZER_NAME = "nmt_nfkc"  # sentencepiece_trainer.cc:31

_TRAINERS: Dict[int, Type[TrainerInterface]] = {
    ModelType.UNIGRAM: unigram.Trainer,
    ModelType.BPE: bpe.Trainer,
    ModelType.WORD: word.Trainer,
    ModelType.CHAR: char.Trainer,
}


class NotFoundError(KeyError):
    pass


def set_proto_field(key: str, value: str, spec) -> None:
    """String -> typed field reflection (generated spec_parser.h:97-435)."""
    field = next((f for f in spec.FIELDS if f.name == key), None)
    if field is None:
        raise NotFoundError(f'unknown field name "{key}" in spec.')

    def parse_one(v: str):
        if field.kind == K_STRING:
            return v
        if field.kind == K_BOOL:
            lv = v.lower()
            if lv in ("1", "t", "true", ""):
                return True
            if lv in ("0", "f", "false"):
                return False
            raise ValueError(f"cannot parse {v} as bool.")
        if field.kind == K_INT32:
            return int(v)
        if field.kind == K_FLOAT:
            return float(v)
        if field.kind == K_ENUM:
            # model_type enum (spec_parser.h enum maps, case-insensitive)
            try:
                return ModelType.value(v)
            except KeyError:
                raise ValueError(f"unknown enum value {v}")
        return v

    if field.repeated:
        # comma-split repeated fields (spec_parser.h)
        items = [x for x in value.split(",") if x != ""]
        setattr(spec, key, list(getattr(spec, key))
                + [parse_one(x) for x in items])
    else:
        setattr(spec, key, parse_one(value))


def merge_specs_from_args(args: str, trainer_spec: TrainerSpec,
                          normalizer_spec: NormalizerSpec) -> None:
    """Parse "--k=v ..." (sentencepiece_trainer.cc:93-139)."""
    if not args:
        return
    for arg in args.split(" "):
        if not arg:
            continue
        if arg.startswith("--"):
            arg = arg[2:]
        if "=" in arg:
            key, value = arg.split("=", 1)
        else:
            key, value = arg, ""
        if key == "normalization_rule_name":
            normalizer_spec.name = value
            continue
        if key == "minloglevel":
            level = int(value)
            logging.getLogger("sentencepiece_tpu").setLevel(
                [logging.INFO, logging.WARNING, logging.ERROR,
                 logging.CRITICAL][min(max(level, 0), 3)])
            continue
        try:
            set_proto_field(key, value, trainer_spec)
            continue
        except NotFoundError:
            pass
        set_proto_field(key, value, normalizer_spec)  # raises if unknown


def get_normalizer_spec(name: str) -> NormalizerSpec:
    """sentencepiece_trainer.cc:75-82."""
    spec = NormalizerSpec()
    spec.name = name
    spec.precompiled_charsmap = builder.get_precompiled_charsmap(name)
    return spec


def populate_normalizer_spec(normalizer_spec: NormalizerSpec) -> None:
    """Compile TSV rules or look up a precompiled map
    (sentencepiece_trainer.cc:163-188)."""
    if normalizer_spec.normalization_rule_tsv:
        if normalizer_spec.precompiled_charsmap:
            raise ValueError("precompiled_charsmap is already defined.")
        with open(normalizer_spec.normalization_rule_tsv,
                  encoding="utf-8") as f:
            cmap = charsmap_lib.load_charsmap_tsv(f.read())
        normalizer_spec.precompiled_charsmap = \
            charsmap_lib.compile_charsmap(cmap)
        normalizer_spec.name = "user_defined"
    else:
        if not normalizer_spec.name:
            normalizer_spec.name = DEFAULT_NORMALIZER_NAME
        if not normalizer_spec.precompiled_charsmap:
            normalizer_spec.precompiled_charsmap = \
                builder.get_precompiled_charsmap(normalizer_spec.name)


def train(args: Optional[str] = None,
          trainer_spec: Optional[TrainerSpec] = None,
          normalizer_spec: Optional[NormalizerSpec] = None,
          engine: str = "exact",
          checkpoint_path: Optional[str] = None,
          **kwargs) -> ModelProto:
    """Train a model from a flag string, kwargs, or explicit specs
    (sentencepiece_trainer.cc:44-67, 148-154). Returns the ModelProto (the
    reference writes the artifact only; we also hand it back)."""
    _tune_malloc()
    if engine == "device":
        from ..utils import compile_cache

        compile_cache.enable()
    if trainer_spec is None:
        trainer_spec = TrainerSpec()
    if normalizer_spec is None:
        normalizer_spec = NormalizerSpec()
    if args is not None:
        merge_specs_from_args(args, trainer_spec, normalizer_spec)
    for k, v in kwargs.items():
        if isinstance(v, (list, tuple)):
            v = ",".join(str(x) for x in v)
        elif isinstance(v, bool):
            v = "true" if v else "false"
        else:
            v = str(v)
        if k == "normalization_rule_name":
            normalizer_spec.name = v
            continue
        try:
            set_proto_field(k, v, trainer_spec)
        except NotFoundError:
            set_proto_field(k, v, normalizer_spec)
    populate_normalizer_spec(normalizer_spec)
    log.info("Training with: %s", trainer_spec)
    trainer_cls = _TRAINERS.get(trainer_spec.model_type)
    if trainer_cls is None:
        raise ValueError(f"unknown model_type: {trainer_spec.model_type}")
    if trainer_spec.model_type == ModelType.UNIGRAM:
        # engine="device": mesh-parallel EM; checkpoint_path: resumable EM
        return trainer_cls(trainer_spec, normalizer_spec, engine=engine,
                           checkpoint_path=checkpoint_path).train()
    if trainer_spec.model_type == ModelType.BPE:
        return trainer_cls(trainer_spec, normalizer_spec,
                           engine=engine).train()
    return trainer_cls(trainer_spec, normalizer_spec).train()


class SentencePieceTrainer:
    """Binding-compatible static facade (python/sentencepiece.i:118-141
    exposes only Train(flag_string))."""

    @staticmethod
    def Train(args: Optional[str] = None, **kwargs) -> ModelProto:
        return train(args, **kwargs)

    train = Train
