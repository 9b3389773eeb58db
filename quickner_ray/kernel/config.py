"""Configuration tree — TOML-loadable port of the reference's ``Config``.

Field names and defaults mirror quickner-core/src/config.rs:27-232 (core
defaults: max_length=1024, Input.filter=Some(true)). The reference's
``process()`` treats a missing ``filter`` flag as false (quickner.rs:414,422);
we expose the same behavior. The PyO3 default-config bug (max_length=0 in
src/pyconfig.rs:26-73, which would reject every text when filtering) is
documented and NOT copied (SURVEY.md §2.7).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from pathlib import Path

from .filters import Filters


@dataclass
class Input:
    path: str = ""
    filter: bool | None = True


@dataclass
class Texts:
    input: Input = field(default_factory=Input)
    filters: Filters = field(default_factory=Filters)


@dataclass
class Output:
    path: str = ""


@dataclass
class Annotations:
    output: Output = field(default_factory=Output)
    format: str = "jsonl"  # csv | jsonl | spacy | brat | conll (config.rs:200-212)


@dataclass
class Excludes:
    path: str | None = None


@dataclass
class Entities:
    input: Input = field(default_factory=Input)
    filters: Filters = field(default_factory=Filters)
    excludes: Excludes = field(default_factory=Excludes)


@dataclass
class Logging:
    level: str = "info"


@dataclass
class Config:
    texts: Texts = field(default_factory=Texts)
    annotations: Annotations = field(default_factory=Annotations)
    entities: Entities = field(default_factory=Entities)
    logging: Logging | None = field(default_factory=Logging)

    @staticmethod
    def from_file(path: str) -> "Config":
        """TOML -> Config (config.rs:234-245). Missing file raises; a bad
        parse raises ValueError (the reference process-exits)."""
        import tomllib

        raw = Path(path).read_bytes()
        try:
            data = tomllib.loads(raw.decode("utf-8"))
        except tomllib.TOMLDecodeError as e:  # pragma: no cover
            raise ValueError(f"Unable to parse the configuration file: {e}") from e
        return Config.from_dict(data)

    @staticmethod
    def from_dict(data: dict) -> "Config":
        def filters(d: dict) -> Filters:
            return Filters(
                alphanumeric=d.get("alphanumeric", False),
                case_sensitive=d.get("case_sensitive", False),
                min_length=d.get("min_length", 0),
                max_length=d.get("max_length", 1024),
                punctuation=d.get("punctuation", False),
                numbers=d.get("numbers", False),
                special_characters=d.get("special_characters", False),
                accept_special_characters=d.get("accept_special_characters"),
            )

        def inp(d: dict) -> Input:
            return Input(path=d.get("path", ""), filter=d.get("filter"))

        t = data.get("texts", {})
        a = data.get("annotations", {})
        e = data.get("entities", {})
        cfg = Config(
            texts=Texts(input=inp(t.get("input", {})), filters=filters(t.get("filters", {}))),
            annotations=Annotations(
                output=Output(path=a.get("output", {}).get("path", "")),
                format=a.get("format", "jsonl"),
            ),
            entities=Entities(
                input=inp(e.get("input", {})),
                filters=filters(e.get("filters", {})),
                excludes=Excludes(path=e.get("excludes", {}).get("path")),
            ),
            logging=Logging(level=data.get("logging", {}).get("level", "info")),
        )
        return cfg
