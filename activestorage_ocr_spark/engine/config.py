"""Env-var configuration + validation.

Mirrors the reference's two config surfaces:

* `lib/activestorage/ocr/configuration.rb:56-63,126-128` — defaults read
  from environment variables, validated setters that raise on unknown
  engine/preset values (pinned by its `configuration_test.rb`);
* `rust/src/main.rs:20-40` — `OCR_DEFAULT_LANGUAGE`, `OCR_MAX_FILE_SIZE`
  clap env args.

Spark posture: the config is resolved ON THE DRIVER when a pipeline
operator builds its kernel (`operators/extraction.py`), never inside
workers — kernels stay pure functions of their arguments, and a cluster
doesn't need env mirroring onto executors.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from .rasters import DEFAULT_LANGUAGE, SUPPORTED_LANGUAGES

ENGINES = ("pixelocr", "pixelocr-alt")
PRESETS = ("none", "minimal", "default", "aggressive")
DEFAULT_MAX_BYTES = 52_428_800
#: per-document wall budget: the reference's 30 s request timeout
#: (`lib/activestorage/ocr/configuration.rb:58-59`). 0 disables.
DEFAULT_DOC_TIMEOUT_MS = 30_000

#: env var names (the ACTIVESTORAGE_OCR_* / OCR_* analog for this package)
ENV_ENGINE = "ASOS_OCR_ENGINE"
ENV_PRESET = "ASOS_OCR_PREPROCESS"
ENV_MAX_BYTES = "ASOS_OCR_MAX_FILE_SIZE"
ENV_LANGUAGE = "ASOS_OCR_DEFAULT_LANGUAGE"
ENV_DOC_TIMEOUT = "ASOS_OCR_DOC_TIMEOUT_MS"


@dataclass(frozen=True)
class EngineConfig:
    engine: str = ENGINES[0]
    preset: str = "minimal"
    max_bytes: int = DEFAULT_MAX_BYTES
    default_language: str = DEFAULT_LANGUAGE
    doc_timeout_ms: int = DEFAULT_DOC_TIMEOUT_MS

    def validate(self) -> "EngineConfig":
        """Raise ValueError on any invalid field (configuration.rb raises
        ArgumentError from its setters; same contract)."""
        if self.engine not in ENGINES:
            raise ValueError(
                f"unknown engine: {self.engine!r}; available: {', '.join(ENGINES)}"
            )
        if self.preset not in PRESETS:
            raise ValueError(
                f"unknown preprocess preset: {self.preset!r}; "
                f"available: {', '.join(PRESETS)}"
            )
        if not isinstance(self.max_bytes, int) or self.max_bytes <= 0:
            raise ValueError(f"max file size must be a positive int, got {self.max_bytes!r}")
        if self.default_language not in SUPPORTED_LANGUAGES:
            raise ValueError(
                f"unsupported default language: {self.default_language!r}; "
                f"available: {', '.join(SUPPORTED_LANGUAGES)}"
            )
        if not isinstance(self.doc_timeout_ms, int) or self.doc_timeout_ms < 0:
            raise ValueError(
                f"doc timeout must be a non-negative int of ms, got {self.doc_timeout_ms!r}"
            )
        return self

    @classmethod
    def from_env(cls, env: dict | None = None) -> "EngineConfig":
        env = os.environ if env is None else env
        raw_max = env.get(ENV_MAX_BYTES)
        try:
            max_bytes = int(raw_max) if raw_max is not None else DEFAULT_MAX_BYTES
        except ValueError:
            raise ValueError(f"{ENV_MAX_BYTES} must be an integer, got {raw_max!r}") from None
        raw_to = env.get(ENV_DOC_TIMEOUT)
        try:
            doc_timeout_ms = int(raw_to) if raw_to is not None else DEFAULT_DOC_TIMEOUT_MS
        except ValueError:
            raise ValueError(f"{ENV_DOC_TIMEOUT} must be an integer, got {raw_to!r}") from None
        return cls(
            engine=env.get(ENV_ENGINE, ENGINES[0]),
            preset=env.get(ENV_PRESET, "minimal"),
            max_bytes=max_bytes,
            default_language=env.get(ENV_LANGUAGE, DEFAULT_LANGUAGE),
            doc_timeout_ms=doc_timeout_ms,
        ).validate()
