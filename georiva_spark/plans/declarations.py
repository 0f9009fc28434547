"""Derived-product declaration layer (reference:
core/derived_products/definitions.py:24-192, ADR-0008) + chain DAG
(sources/derivation_chain.py:52-111).

Pure declaration — frozen dataclasses with string enums, no engine or
Spark imports — so both the recipe layer and any orchestration can read
the contract without a dependency cycle. A ``DerivedProductDefinition``
is the single source of truth for: config validation (``validate_config``
coerces + rejects unknown keys before any row is written), input/output
collection wiring, and the planned chain DAG (``build_chain_graph``).

The DAG has two edge sources, mirroring the reference: data-flow edges
inferred from output→input collection overlap, unioned with explicit
``depends_on`` keys for side-effect dependencies the tier-aware rule
can't infer. ``downstream_keys`` is what the engine consults on a
``derivation.completed`` event to chain follow-on products.
"""

from __future__ import annotations

from dataclasses import dataclass, field

TRIGGER_MODES = ("event", "scheduled", "manual")
CONFIG_FIELD_TYPES = ("str", "int", "float", "bool", "choice")
TIERS = ("staging", "published")
VISIBILITIES = ("public", "private", "internal")

_SCALAR_COERCERS = {"str": str, "int": int, "float": float, "bool": bool}


def _coerce(f: "ConfigField", value):
    if f.type == "choice":
        if value not in f.choices:
            raise ValueError(
                f"ConfigField {f.key!r}: {value!r} not among {f.choices}")
        return value
    try:
        return _SCALAR_COERCERS[f.type](value)
    except (TypeError, ValueError) as e:
        raise ValueError(
            f"ConfigField {f.key!r}: {value!r} is not a valid {f.type}") from e


@dataclass(frozen=True)
class InputRef:
    """One declared input: a collection at a tier (definitions.py:54-76)."""
    role: str
    collection: str
    tier: str
    required: bool = True

    def __post_init__(self):
        if not self.role or not self.collection:
            raise ValueError("InputRef: role and collection are required")
        if self.tier not in TIERS:
            raise ValueError(f"InputRef {self.role!r}: tier must be one of "
                             f"{TIERS}, got {self.tier!r}")


@dataclass(frozen=True)
class OutputRef:
    """One produced collection + its display/visibility metadata
    (definitions.py:79-101)."""
    role: str
    collection: str
    title: str = ""
    description: str = ""
    visibility: str = "public"

    def __post_init__(self):
        if not self.role or not self.collection:
            raise ValueError("OutputRef: role and collection are required")
        if self.visibility not in VISIBILITIES:
            raise ValueError(f"OutputRef {self.role!r}: visibility must be "
                             f"one of {VISIBILITIES}, got {self.visibility!r}")


@dataclass(frozen=True)
class ConfigField:
    """One operator-configurable option (definitions.py:104-126)."""
    key: str
    type: str
    default: object = None
    choices: tuple = None

    def __post_init__(self):
        if self.type not in CONFIG_FIELD_TYPES:
            raise ValueError(f"ConfigField {self.key!r}: type must be one of "
                             f"{CONFIG_FIELD_TYPES}, got {self.type!r}")
        if self.type == "choice":
            if not self.choices:
                raise ValueError(
                    f"ConfigField {self.key!r}: choice type needs choices")
            if self.default is not None and self.default not in self.choices:
                raise ValueError(
                    f"ConfigField {self.key!r}: default {self.default!r} "
                    f"not among {self.choices}")


@dataclass(frozen=True)
class DerivedProductDefinition:
    """Blueprint for one derived product (definitions.py:129-192)."""
    key: str
    recipe_type: str
    label: str
    description: str = ""
    config_schema: tuple = ()
    inputs: tuple = ()
    outputs: tuple = ()
    trigger_mode: str = "event"
    default_enabled: bool = True
    depends_on: tuple = ()

    def __post_init__(self):
        for f in ("key", "recipe_type", "label"):
            if not getattr(self, f):
                raise ValueError(
                    f"DerivedProductDefinition: {f!r} is required")
        if self.trigger_mode not in TRIGGER_MODES:
            raise ValueError(
                f"DerivedProductDefinition {self.key!r}: trigger_mode must "
                f"be one of {TRIGGER_MODES}, got {self.trigger_mode!r}")
        for dep in self.depends_on:
            if not dep or dep == self.key:
                raise ValueError(
                    f"DerivedProductDefinition {self.key!r}: bad depends_on "
                    f"entry {dep!r}")

    def validate_config(self, config: dict) -> dict:
        """Coerce operator config against the schema; fill defaults;
        reject unknown keys. Raises ValueError before any row is written
        (definitions.py:163-185)."""
        schema = {f.key: f for f in self.config_schema}
        unknown = set(config) - set(schema)
        if unknown:
            raise ValueError(
                f"DerivedProductDefinition {self.key!r}: unknown config "
                f"option(s) {sorted(unknown)}; allowed {sorted(schema)}")
        return {k: (_coerce(f, config[k]) if k in config else f.default)
                for k, f in schema.items()}

    def dependency_edges(self) -> list[tuple[str, str, bool]]:
        """Incoming chain edges as (collection, tier, required)
        (definitions.py:187-192)."""
        return [(r.collection, r.tier, r.required) for r in self.inputs]


# ---------------------------------------------------------------------------
# Chain DAG (derivation_chain.py:52-111)
# ---------------------------------------------------------------------------

@dataclass
class ChainEdge:
    key: str
    label: str
    recipe_type: str
    trigger_mode: str
    inputs: list
    outputs: list
    state: str = "new"       # new | enabled | disabled | orphaned


@dataclass
class ChainGraph:
    nodes: list = field(default_factory=list)   # collection slugs
    edges: list = field(default_factory=list)


def build_chain_graph(definitions: list[DerivedProductDefinition],
                      rows: dict[str, dict] | None = None) -> ChainGraph:
    """Declarations + provisioned state → planned DAG. ``rows`` maps a
    definition key to its provisioned state ({"enabled": bool, "label":
    str}); declared-but-unprovisioned products show as state="new",
    provisioned-but-undeclared rows as flagged "orphaned" edges with no
    topology (derivation_chain.py:52-111)."""
    rows = rows or {}
    declared = {d.key for d in definitions}
    nodes: list[str] = []
    edges: list[ChainEdge] = []

    def add_nodes(slugs):
        for s in slugs:
            if s not in nodes:
                nodes.append(s)

    for d in definitions:
        ins = [r.collection for r in d.inputs]
        outs = [r.collection for r in d.outputs]
        add_nodes(ins + outs)
        row = rows.get(d.key)
        if row is None:
            state, label = "new", d.label
        else:
            state = "enabled" if row.get("enabled", True) else "disabled"
            label = row.get("label") or d.label
        edges.append(ChainEdge(key=d.key, label=label,
                               recipe_type=d.recipe_type,
                               trigger_mode=d.trigger_mode,
                               inputs=ins, outputs=outs, state=state))
    for key, row in rows.items():
        if key not in declared:
            edges.append(ChainEdge(key=key, label=row.get("label", key),
                                   recipe_type=row.get("recipe_type", ""),
                                   trigger_mode="", inputs=[], outputs=[],
                                   state="orphaned"))
    return ChainGraph(nodes=nodes, edges=edges)


def product_edges(definitions: list[DerivedProductDefinition]
                  ) -> list[tuple[str, str]]:
    """(upstream_key, downstream_key) product-level DAG edges: data-flow
    (an output collection of A is an input collection of B) unioned with
    explicit depends_on. Unknown depends_on targets raise here, where the
    full definition set is available (definitions.py:134-139 note)."""
    by_key = {d.key: d for d in definitions}
    producers: dict[str, list[str]] = {}
    for d in definitions:
        for r in d.outputs:
            producers.setdefault(r.collection, []).append(d.key)
    edges: set[tuple[str, str]] = set()
    for d in definitions:
        for r in d.inputs:
            for up in producers.get(r.collection, ()):
                if up != d.key:
                    edges.add((up, d.key))
        for dep in d.depends_on:
            if dep not in by_key:
                raise ValueError(f"{d.key!r} depends_on unknown product "
                                 f"{dep!r}")
            edges.add((dep, d.key))
    return sorted(edges)


def downstream_keys(definitions: list[DerivedProductDefinition],
                    collection: str) -> list[str]:
    """Product keys consuming ``collection`` — what the engine dispatches
    when a derivation completes into that collection."""
    return sorted({d.key for d in definitions
                   if any(r.collection == collection for r in d.inputs)})
