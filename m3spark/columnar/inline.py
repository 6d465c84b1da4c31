"""Driver-side eager ``$ref``/``$defs`` inlining for the columnar
compiler (SURVEY §2.8 "eager driver-side inlining with cycle
detection").

The most common schema idiom — a document reusing fragments via
``$defs``/``definitions`` and local ``$ref`` — previously routed the
whole query to the Arrow interpreter because the Column-expression
compiler cannot follow references at plan-build time.  This pre-pass
expands acyclic LOCAL references once on the driver, so the compiled
plan stays pure JVM.

Draft semantics mirror the reference engine:

- drafts <= 7: ``$ref`` REPLACES its siblings — the node becomes the
  resolved target (reference property.cljc:227-246, ref.cljc:133-140);
- 2019-09+: ``$ref`` MELDS with its siblings — the node becomes
  ``{"allOf": [target], **siblings}`` (property.cljc:247-295,
  ref.cljc:141-151).  Representing the melded ref as an ``allOf``
  branch is annotation-exact for the unevaluated* claim algebra: a
  ``$ref``'s annotations flow to the parent schema exactly when the
  referenced schema succeeds, which is precisely the compiler's
  branch-claim rule (annotation-scope isolation,
  property.cljc:268-293).

The transform is conservative — it returns the ORIGINAL schema
untouched (so the compiler's standing ``UnsupportedKeyword`` escape
hatch routes it to the interpreter) whenever it sees:

- an external / non-fragment reference (``$ref`` not starting ``#``);
- a ``$dynamicRef`` whose target cannot be fixed statically (see
  below — in the single-resource world this transform enforces, most
  CAN be);
- a nested ``$id``/``id`` that changes the base URI (non-fragment
  value below the root), which would alter pointer resolution;
- a NON-PRODUCTIVE reference cycle (a ``$ref`` loop that re-enters
  itself without descending through any data-structural keyword —
  unrolling it would never consume input depth);
- expansion beyond a node budget (diamond-DAG blow-up guard).

PRODUCTIVE cycles — recursion that passes through ``properties`` /
``items`` / another data-descent keyword (the linked-list / tree
idiom, reference lazy resolution at property.cljc:204-295) — are
UNROLLED ``unroll`` levels (default 8, ``M3SPARK_REF_UNROLL``).  Spark
column types are finite trees, so the unrolled plan is EXACT for every
input whose type nests no deeper than the unroll depth: the compiler's
type-driven builder descent simply never reaches the cut.  At the cut
the inliner plants ``{"x-m3-unroll-guard": <ref>}``; the compiler
lowers that to a builder that raises ``UnsupportedKeyword`` at
``apply()`` time IF AND ONLY IF the input column type actually nests
deeper than the unroll — i.e. deeper-typed tables still route to the
Arrow interpreter, shallow ones stay pure JVM.

Only the tree positions that hold schemas are rewritten — literal
values under ``enum`` / ``const`` / ``default`` / ``examples`` are
copied verbatim, so data that merely *looks* like a ``$ref`` object is
never touched.

``$recursiveRef`` / ``$dynamicRef`` (SURVEY §2.8 "static scope-chain
simulation"): because the transform already aborts on external refs
and nested base-URI changes, every schema it processes is a SINGLE
schema resource — so the runtime dynamic scope chain
(core.py c_recursive_ref / c_dynamic_ref, reference
property.cljc:131-197) can never hold more than that one resource and
both keywords resolve statically:

- ``$recursiveRef: "#"`` (active only in 2019-09) resolves to the
  resource root whether or not it carries ``$recursiveAnchor`` —
  with one resource in scope the dynamic and lexical answers
  coincide — i.e. exactly ``$ref: "#"``;
- ``$dynamicRef: "#name"`` (2020-12: bookended — dynamic only when
  the target resource declares ``$dynamicAnchor: name``, else plain
  ``$ref`` semantics; draft-next: no bookend, falling back to a plain
  ``$anchor`` of that name) resolves to the root resource's matching
  anchor node;
- pointer-fragment forms (``#/...``) are plain references in every
  draft;
- in drafts where the keyword is INACTIVE (e.g. ``$dynamicRef`` under
  draft-7) the interpreter ignores it entirely, so it is stripped.

Resolved targets then flow through the same meld-as-allOf + unroll
machinery as plain ``$ref`` (both keywords exist only in meld-era
drafts).
"""

from __future__ import annotations

import logging
import os
from urllib.parse import unquote

from m3spark.schema.core import (DRAFT3, DRAFT4, D2019, D2020, DNEXT,
                                 _ge, draft_of)

__all__ = ["inline_local_refs", "UNROLL_GUARD_KEY"]

_log = logging.getLogger(__name__)

# marker planted at a productive-cycle cut; the compiler lowers it to a
# builder that raises UnsupportedKeyword only when the input type is
# deep enough to reach it (never a real JSON Schema keyword)
UNROLL_GUARD_KEY = "x-m3-unroll-guard"


def _default_unroll() -> int:
    return int(os.environ.get("M3SPARK_REF_UNROLL", "8"))

# keys whose value is one schema (or draft-dependent single-schema form)
_SINGLE_SCHEMA_KEYS = (
    "additionalItems", "additionalProperties", "contains", "propertyNames",
    "not", "if", "then", "else", "unevaluatedItems",
    "unevaluatedProperties", "contentSchema",
)
# keys whose value is a map name -> schema
_MAP_SCHEMA_KEYS = ("properties", "patternProperties", "$defs",
                    "definitions", "dependentSchemas")
# keys whose value is a list of schemas
_LIST_SCHEMA_KEYS = ("allOf", "anyOf", "oneOf", "prefixItems")

# inert after successful inlining: definition containers and anchors
# (anchors matter only to the ref family, which no longer exists in
# the output — $recursiveRef/$dynamicRef are statically resolved or
# the whole transform gave up)
_STRIP_KEYS = frozenset({"$defs", "definitions", "$anchor",
                         "$dynamicAnchor", "$recursiveAnchor"})
_REF_KEYS = ("$ref", "$recursiveRef", "$dynamicRef")

_NODE_BUDGET = 20_000

# keywords whose subschema applies to a CHILD value (consumes input
# depth) — a $ref cycle is productive, and therefore unrollable, only
# if every loop passes through one of these
_DATA_DESCENT_KEYS = frozenset({
    "properties", "patternProperties", "additionalProperties",
    "items", "prefixItems", "additionalItems", "contains",
    "unevaluatedItems", "unevaluatedProperties",
    "contentSchema",
    # NOT propertyNames: its fragment is evaluated driver-side by the
    # interpreter at compile time (build_pn_root), which treats a
    # planted guard as an unknown-keyword no-op — a cycle through it
    # must stay a GiveUp, never an unroll
})
# sentinel pushed on the expansion stack at each data descent
_DESCENT = "*"


class _GiveUp(Exception):
    """Transform cannot be done safely; caller keeps the original."""


def inline_local_refs(schema, draft: str, unroll: int | None = None):
    """Return ``schema`` with every local ``$ref`` eagerly expanded
    (productive cycles unrolled ``unroll`` levels, cut with
    ``UNROLL_GUARD_KEY`` markers), or ``schema`` unchanged if any
    reference cannot be handled safely."""
    if not isinstance(schema, dict):
        return schema
    try:
        if not _contains_ref(schema):
            return schema
        return _Inliner(schema, draft,
                        _default_unroll() if unroll is None
                        else unroll).run()
    except _GiveUp:
        return schema


def _contains_ref(node) -> bool:
    """Cheap structural scan: does any schema position carry a ref-family
    keyword?  (Walks every dict/list — over-approximate on purpose; the
    real transform is schema-position-aware.)"""
    if isinstance(node, dict):
        if any(k in node for k in ("$ref", "$dynamicRef", "$recursiveRef")):
            return True
        return any(_contains_ref(v) for v in node.values())
    if isinstance(node, list):
        return any(_contains_ref(x) for x in node)
    return False


class _Inliner:
    def __init__(self, root: dict, draft: str, unroll: int = 8):
        self.root = root
        self.draft = draft
        self.unroll = max(0, unroll)
        self.meld = _ge(draft, D2019)
        self.id_key = "id" if draft in (DRAFT3, DRAFT4) else "$id"
        self.anchors: dict[str, object] = {}
        self.dyn_anchors: dict[str, object] = {}
        self.budget = _NODE_BUDGET
        # dict nodes the feasibility scan has covered (by identity);
        # pointer targets outside known schema positions get a late scan
        self._visited: set[int] = set()
        self._scan(root, top=True)

    # -- pre-scan: feasibility + anchor table ---------------------------

    def _scan(self, node, top=False, register=True):
        """Abort on unsafe refs / base-URI changes; collect anchors.

        ``register=False`` for the LATE scan of a pointer target outside
        known schema positions: the interp's _Index never walks such
        subtrees (core.py _iter_subschemas), so a $dynamicAnchor found
        there is unregistered/inert in the interp and must stay
        unregistered here too."""
        if isinstance(node, list):
            for x in node:
                self._scan(x, register=register)
            return
        if not isinstance(node, dict):
            return
        self._visited.add(id(node))
        r = node.get("$ref")
        if r is not None and (not isinstance(r, str)
                              or not r.startswith("#")):
            raise _GiveUp("external ref")
        # $recursiveRef / $dynamicRef: statically resolvable here (see
        # module docstring) when local; non-str values are ignored by
        # the interpreter (core.py c_recursive_ref / c_dynamic_ref) and
        # will be stripped, so only external STRING targets abort
        for k in ("$recursiveRef", "$dynamicRef"):
            v = node.get(k)
            if isinstance(v, str) and not v.startswith("#") \
                    and self._ref_active(k):
                raise _GiveUp(f"external {k}")
        da = node.get("$dynamicAnchor")
        if isinstance(da, str) and self.draft in (D2020, DNEXT) \
                and register:
            if da in self.dyn_anchors:
                if self.dyn_anchors[da] is not node:
                    raise _GiveUp(f"duplicate dynamic anchor {da!r}")
            else:
                self.dyn_anchors[da] = node
                # mirrors _Index.index: a $dynamicAnchor also answers
                # plain $ref lookups unless a $anchor claims the name
                self.anchors.setdefault(da, node)
        iv = node.get(self.id_key)
        if isinstance(iv, str) and iv:
            if iv.startswith("#"):
                if register:
                    self._add_anchor(iv[1:], node)
            elif not top:
                raise _GiveUp("nested base-URI change")
        av = node.get("$anchor")
        if isinstance(av, str) and _ge(self.draft, D2019) and register:
            self._add_anchor(av, node)
        # structural walk mirrors the transform's schema positions
        for k in _SINGLE_SCHEMA_KEYS:
            if k in node:
                self._scan(node[k], register=register)
        for k in _MAP_SCHEMA_KEYS:
            v = node.get(k)
            if isinstance(v, dict):
                for s in v.values():
                    self._scan(s, register=register)
        for k in _LIST_SCHEMA_KEYS:
            v = node.get(k)
            if isinstance(v, list):
                for s in v:
                    self._scan(s, register=register)
        items = node.get("items")
        if isinstance(items, list):
            for s in items:
                self._scan(s, register=register)
        else:
            self._scan(items, register=register)
        ext = node.get("extends")
        if isinstance(ext, list):
            for s in ext:
                self._scan(s, register=register)
        elif ext is not None:
            self._scan(ext, register=register)
        deps = node.get("dependencies")
        if isinstance(deps, dict):
            for v in deps.values():
                if isinstance(v, (dict, bool)):
                    self._scan(v, register=register)
        pd = node.get("propertyDependencies")
        if isinstance(pd, dict):
            for m in pd.values():
                if isinstance(m, dict):
                    for s in m.values():
                        self._scan(s, register=register)

    def _ref_active(self, keyword: str) -> bool:
        """Is this ref-family keyword active in the compile draft?
        (core.py _KEYWORDS: $recursiveRef only in 2019-09, $dynamicRef
        in 2020-12/next; plain $ref everywhere.)"""
        if keyword == "$recursiveRef":
            return self.draft == D2019
        if keyword == "$dynamicRef":
            return self.draft in (D2020, DNEXT)
        return True

    def _add_anchor(self, name: str, node):
        if name in self.anchors:
            if self.anchors[name] is node:
                return  # idempotent re-scan of the same subtree
            raise _GiveUp(f"duplicate anchor {name!r}")
        self.anchors[name] = node

    # -- resolution -----------------------------------------------------

    def _resolve(self, ref: str):
        """'#...' -> (raw target node, cycle key)."""
        frag = unquote(ref[1:])
        if frag == "":
            return self.root, "#"
        if frag.startswith("/"):
            node = self.root
            for tok in frag[1:].split("/"):
                tok = tok.replace("~1", "/").replace("~0", "~")
                if isinstance(node, dict) and tok in node:
                    node = node[tok]
                elif isinstance(node, list) and tok.isdigit() \
                        and int(tok) < len(node):
                    node = node[int(tok)]
                else:
                    raise _GiveUp(f"unresolvable pointer {ref!r}")
            # a pointer may land in a document position the feasibility
            # pre-scan never walked (under an unknown keyword, inside
            # enum/const data, ...).  Run the same scan late over the
            # target subtree so the dynamic-ref / nested-$id /
            # external-ref guards hold there too (r6 advice).
            if isinstance(node, dict) and id(node) not in self._visited:
                self._scan(node, register=False)
            return node, f"#{frag}"
        if frag in self.anchors:
            return self.anchors[frag], f"#anchor:{frag}"
        raise _GiveUp(f"unresolvable anchor {ref!r}")

    def _resolve_dynamic(self, ref: str):
        """$dynamicRef target in the single-resource world (mirrors
        core.py c_dynamic_ref with rt.scope == [root resource])."""
        frag = unquote(ref[1:])
        if frag == "" or frag.startswith("/"):
            # pointer / empty fragment: plain-$ref semantics
            return self._resolve(ref)
        dyn = self.dyn_anchors.get(frag)
        if dyn is not None:
            # runtime scope walk finds this same node (only resource)
            return dyn, f"#dyn:{frag}"
        if self.draft == D2020:
            # bookend unsatisfied -> plain $ref semantics
            return self._resolve(ref)
        # draft-next: static fallback to a plain anchor; with neither,
        # the interp emits a per-row "no anchor in dynamic scope"
        # error — leave that path to the interp
        if frag in self.anchors:
            return self.anchors[frag], f"#anchor:{frag}"
        raise _GiveUp(f"unresolvable dynamic anchor {ref!r}")

    # -- transform ------------------------------------------------------

    def run(self):
        return self._schema(self.root, (), top=True)

    def _spend(self):
        self.budget -= 1
        if self.budget <= 0:
            raise _GiveUp("expansion budget exceeded")

    def _schema(self, node, stack: tuple, top=False):
        """``stack`` holds the cycle keys of in-flight expansions plus a
        ``_DESCENT`` sentinel per data-structural descent; re-entering a
        key with no descent since its last occurrence is a
        non-productive loop (GiveUp), re-entering through descent
        unrolls up to ``self.unroll`` times, then cuts with a guard."""
        if isinstance(node, bool) or node is None:
            return node
        if not isinstance(node, dict):
            return node
        self._spend()
        r = node.get("$ref")
        if isinstance(r, str) and not self.meld:
            # drafts <= 7: $ref replaces every sibling ($recursiveRef /
            # $dynamicRef are inactive there, so nothing else to meld)
            target, key = self._resolve(r)
            return self._expand(target, key, r, stack)
        # meld-era: each active ref-family keyword contributes an
        # independent checker alongside its siblings (core.py
        # _compile_object ordered keyword list) — expand each into an
        # allOf branch
        branches = []
        had_ref = False
        if isinstance(r, str):
            had_ref = True
            branches.append(self._expand(*self._resolve(r), r, stack))
        rr = node.get("$recursiveRef")
        if isinstance(rr, str) and self._ref_active("$recursiveRef"):
            # "#" resolves to the resource root whether or not it has
            # $recursiveAnchor (single resource in scope — docstring);
            # non-"#" values fall back to plain-$ref semantics
            # (core.py c_recursive_ref)
            had_ref = True
            branches.append(self._expand(*self._resolve(rr), rr, stack))
        dr = node.get("$dynamicRef")
        if isinstance(dr, str) and self._ref_active("$dynamicRef"):
            had_ref = True
            branches.append(
                self._expand(*self._resolve_dynamic(dr), dr, stack))
        if not had_ref:
            return self._plain(node, stack, top)
        siblings = {k: v for k, v in node.items() if k not in _REF_KEYS}
        branches = [b for b in branches if b is not True and b != {}]
        if not siblings:
            if not branches:
                return True
            if len(branches) == 1:
                return branches[0]
            return {"allOf": branches}
        out = self._plain(siblings, stack, top)
        if branches:
            out["allOf"] = list(out.get("allOf", [])) + branches
        return out

    def _expand(self, target, key: str, refstr: str, stack: tuple):
        """Cycle-aware expansion of one resolved ref target."""
        tail_start = 0
        for i in range(len(stack) - 1, -1, -1):
            if stack[i] == _DESCENT:
                tail_start = i + 1
                break
        if key in stack[tail_start:]:
            raise _GiveUp(f"non-productive cycle through {refstr!r}")
        if key in stack and stack.count(key) >= self.unroll:
            _log.info(
                "recursive ref %s unrolled %d levels; deeper input "
                "types raise UnsupportedKeyword at apply()",
                refstr, self.unroll)
            return {UNROLL_GUARD_KEY: refstr}
        return self._schema(target, stack + (key,))

    def _plain(self, node: dict, stack: tuple, top=False):
        out = {}
        for k, v in node.items():
            if k in _STRIP_KEYS:
                continue
            if k in ("$recursiveRef", "$dynamicRef") and \
                    (not self._ref_active(k) or not isinstance(v, str)):
                # inactive in this draft, or a non-string value: the
                # interpreter ignores it entirely (c_recursive_ref /
                # c_dynamic_ref return None) — drop it so the compiler
                # doesn't route the query to the interp over a no-op
                continue
            if k == self.id_key and isinstance(v, str) and not top:
                # fragment form: inert anchor.  Non-fragment form can
                # only be the ROOT's $id dragged in by inlining the
                # root itself ($recursiveRef '#' / $ref '#'; _scan
                # aborts on nested $id in the INPUT) — with every ref
                # expanded, resource identity no longer matters
                continue
            if k == "$schema" and not top and isinstance(v, str) \
                    and draft_of({"$schema": v}, self.draft) == self.draft:
                # the root's own $schema re-inlined at a nested
                # position: same draft, a no-op for the interp
                # (core.py _compile draft_of) — strip so the compiler
                # keeps the plan columnar.  A GENUINE mid-schema draft
                # switch is kept (and routes to the interp).
                continue
            # keywords applying to a CHILD value consume input depth:
            # mark the descent so a $ref loop through them counts as
            # productive (unrollable) rather than a flat cycle
            st = stack + (_DESCENT,) if k in _DATA_DESCENT_KEYS else stack
            if k in _SINGLE_SCHEMA_KEYS:
                out[k] = self._schema(v, st)
            elif k in _MAP_SCHEMA_KEYS:
                out[k] = ({n: self._schema(s, st) for n, s in v.items()}
                          if isinstance(v, dict) else v)
            elif k in _LIST_SCHEMA_KEYS:
                out[k] = ([self._schema(s, st) for s in v]
                          if isinstance(v, list) else v)
            elif k == "items":
                out[k] = ([self._schema(s, st) for s in v]
                          if isinstance(v, list)
                          else self._schema(v, st))
            elif k == "extends":
                out[k] = ([self._schema(s, st) for s in v]
                          if isinstance(v, list)
                          else self._schema(v, st))
            elif k == "dependencies" and isinstance(v, dict):
                out[k] = {n: (self._schema(s, st)
                              if isinstance(s, (dict, bool)) else s)
                          for n, s in v.items()}
            elif k == "propertyDependencies" and isinstance(v, dict):
                out[k] = {p: ({sv: self._schema(s, st)
                               for sv, s in m.items()}
                              if isinstance(m, dict) else m)
                          for p, m in v.items()}
            else:
                out[k] = v
        return out
