"""Defaults-list composition with Hydra 1.3 semantics (the subset the config tree uses).

Behavioral contract (mirrors reference configs/train.yaml:3-24, configs/experiment/*,
configs/augment/augmix.yaml, configs/hydra/default.yaml):

* a yaml file may carry a ``defaults`` list; entries are composed in order
* ``- _self_`` places the file's own keys at that point in the order
* ``- group: option`` composes ``<group>/<option>.yaml`` under key ``group``
* ``- option.yaml`` (no colon) includes a sibling file of the same group
* ``- override /group: option`` (in experiment/debug files) replaces the previously
  chosen option for a root-level group
* a leading ``# @package _global_`` comment merges the file at the config root
* CLI overrides: ``group=option`` re-chooses a defaults entry, ``a.b.c=value`` sets a
  leaf, ``+a.b=value`` adds one, ``~a.b`` deletes one
* ``${a.b}`` interpolation plus the ``${now:%fmt}`` and ``${hydra:runtime.output_dir}``
  resolvers used by the tree
"""

from __future__ import annotations

import copy
import datetime as _dt
import os
import re
from typing import Any, Dict, List, Optional, Tuple

import yaml

_MISSING = object()


class Config(dict):
    """dict with attribute access and recursive wrapping (omegaconf-lite)."""

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value

    def __delattr__(self, name: str) -> None:
        del self[name]

    def get(self, key, default=None):
        return super().get(key, default)

    @staticmethod
    def wrap(obj: Any) -> Any:
        if isinstance(obj, Config):
            return obj
        if isinstance(obj, dict):
            return Config({k: Config.wrap(v) for k, v in obj.items()})
        if isinstance(obj, (list, tuple)):
            return [Config.wrap(v) for v in obj]
        return obj


def to_dict(obj: Any) -> Any:
    """Recursively convert Config back to plain containers (for yaml dump / hashing)."""
    if isinstance(obj, dict):
        return {k: to_dict(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [to_dict(v) for v in obj]
    return obj


def _deep_merge(base: Dict, patch: Dict) -> Dict:
    """Merge patch into base (hydra-style: dicts merge recursively, lists replace)."""
    for k, v in patch.items():
        if isinstance(v, dict) and isinstance(base.get(k), dict):
            _deep_merge(base[k], v)
        else:
            base[k] = copy.deepcopy(v)
    return base


def _load_yaml(path: str) -> Tuple[Dict, bool]:
    """Load a yaml file; returns (content, is_global_package)."""
    with open(path, "r") as f:
        text = f.read()
    is_global = bool(re.search(r"^#\s*@package\s+_global_\s*$", text, re.MULTILINE))
    data = yaml.safe_load(text)
    if data is None:
        data = {}
    if not isinstance(data, dict):
        raise ValueError(f"config file {path} must contain a mapping, got {type(data)}")
    return data, is_global


def _strip_yaml_ext(name: str) -> str:
    return name[:-5] if name.endswith(".yaml") else (name[:-4] if name.endswith(".yml") else name)


def _find_config_file(config_dir: str, group: str, option: str) -> str:
    option = _strip_yaml_ext(str(option))
    path = os.path.join(config_dir, group, option + ".yaml") if group else os.path.join(config_dir, option + ".yaml")
    if not os.path.exists(path):
        raise FileNotFoundError(f"config not found: group='{group}' option='{option}' ({path})")
    return path


class _DefaultsEntry:
    __slots__ = ("group", "option", "is_self", "is_override")

    def __init__(self, group: str, option: Optional[str], is_self=False, is_override=False):
        self.group = group
        self.option = option
        self.is_self = is_self
        self.is_override = is_override

    def __repr__(self):
        if self.is_self:
            return "_self_"
        pre = "override " if self.is_override else ""
        return f"{pre}{self.group}: {self.option}"


def _parse_defaults(defaults: List, own_group: str = "") -> List[_DefaultsEntry]:
    out: List[_DefaultsEntry] = []
    for item in defaults:
        if item == "_self_":
            out.append(_DefaultsEntry("", None, is_self=True))
        elif isinstance(item, str):
            # sibling include within the same group, e.g. "- default.yaml"
            out.append(_DefaultsEntry(own_group, _strip_yaml_ext(item)))
        elif isinstance(item, dict):
            if len(item) != 1:
                raise ValueError(f"bad defaults entry: {item}")
            (key, value), = item.items()
            key = str(key)
            if key.startswith("override "):
                grp = key[len("override "):].strip().lstrip("/")
                out.append(_DefaultsEntry(grp, None if value is None else _strip_yaml_ext(str(value)), is_override=True))
            else:
                grp = key.lstrip("/")
                out.append(_DefaultsEntry(grp, None if value is None else _strip_yaml_ext(str(value))))
        else:
            raise ValueError(f"bad defaults entry: {item!r}")
    return out


def _compose_file(config_dir: str, group: str, option: str, cfg_root: Dict,
                  group_overrides: Dict[str, Optional[str]]) -> None:
    """Compose one group option file (processing its own defaults list) into cfg_root."""
    path = _find_config_file(config_dir, group, option)
    data, is_global = _load_yaml(path)
    own_defaults = data.pop("defaults", None)

    # Where does this file's content land?
    def merge_self():
        if is_global:
            _deep_merge(cfg_root, data)
        elif group:
            node = cfg_root
            parts = group.split("/")[:1]  # nested dirs (data/dcase2021) still land under top group
            top = parts[0]
            node = cfg_root.setdefault(top, {})
            if not isinstance(node, dict):
                cfg_root[top] = node = {}
            _deep_merge(node, data)
        else:
            _deep_merge(cfg_root, data)

    if own_defaults is None:
        merge_self()
        return

    entries = _parse_defaults(own_defaults, own_group=group)
    # overrides inside a child defaults list retarget root-level groups
    for e in entries:
        if e.is_override:
            group_overrides[e.group] = e.option
    saw_self = any(e.is_self for e in entries)
    for e in entries:
        if e.is_override:
            continue
        if e.is_self:
            merge_self()
        else:
            _compose_file(config_dir, e.group, e.option, cfg_root, group_overrides)
    if not saw_self:
        merge_self()


def parse_cli_overrides(argv: List[str]) -> List[Tuple[str, str, Any]]:
    """Parse hydra-style CLI overrides into (kind, key, value) tuples.

    kind: 'set' | 'add' | 'del'
    """
    out = []
    for arg in argv:
        arg = arg.strip()
        if not arg:
            continue
        if arg.startswith("~"):
            out.append(("del", arg[1:], None))
            continue
        kind = "set"
        if arg.startswith("++"):
            arg, kind = arg[2:], "set"
        elif arg.startswith("+"):
            arg, kind = arg[1:], "add"
        if "=" not in arg:
            raise ValueError(f"override '{arg}' must be key=value")
        key, value = arg.split("=", 1)
        out.append((kind, key.strip(), yaml.safe_load(value) if value != "" else ""))
    return out


def _set_dotted(cfg: Dict, key: str, value: Any, allow_new: bool = True) -> None:
    parts = key.split(".")
    node = cfg
    for p in parts[:-1]:
        nxt = node.get(p, _MISSING) if isinstance(node, dict) else _MISSING
        if nxt is _MISSING or not isinstance(nxt, dict):
            if not allow_new:
                raise KeyError(f"override path '{key}' does not exist")
            nxt = {}
            node[p] = nxt
        node = nxt
    node[parts[-1]] = value


def _del_dotted(cfg: Dict, key: str) -> None:
    parts = key.split(".")
    node = cfg
    for p in parts[:-1]:
        node = node[p]
    node.pop(parts[-1], None)


_INTERP_RE = re.compile(r"\$\{([^${}]+)\}")


def _resolve_interpolations(cfg: Dict, now: _dt.datetime) -> None:
    """Multi-pass eager resolution of ${...} references against the root config."""

    def lookup(path: str) -> Any:
        node: Any = cfg
        for p in path.split("."):
            if isinstance(node, dict) and p in node:
                node = node[p]
            else:
                raise KeyError(path)
        if isinstance(node, str) and "${" in node:
            # target not yet resolved — defer to a later pass instead of baking
            # the raw interpolation text into the consumer
            raise KeyError(path)
        return node

    def resolve_value(v: str) -> Any:
        m = _INTERP_RE.fullmatch(v.strip())
        if m:  # whole-string interpolation may return non-str
            return resolve_token(m.group(1), full=True)

        def sub(mm):
            r = resolve_token(mm.group(1), full=False)
            return str(r)

        return _INTERP_RE.sub(sub, v)

    unresolved: List[str] = []

    def resolve_token(token: str, full: bool) -> Any:
        token = token.strip()
        if token.startswith("now:"):
            return now.strftime(token[len("now:"):])
        if token.startswith("hydra:"):
            # supported: hydra:runtime.output_dir -> cfg['paths']['output_dir'] is
            # itself defined as this resolver; break the cycle via the run-dir rule
            # (reference configs/hydra/default.yaml:11).
            if token == "hydra:runtime.output_dir":
                return lookup("hydra.run.dir")
            raise KeyError(token)
        if token.startswith("oc.env:"):
            name = token[len("oc.env:"):]
            return os.environ.get(name, "")
        return lookup(token)

    def walk(node: Any) -> Tuple[Any, bool]:
        """Returns (new_node, fully_resolved)."""
        done = True
        if isinstance(node, dict):
            for k in list(node.keys()):
                nv, ok = walk(node[k])
                node[k] = nv
                done = done and ok
            return node, done
        if isinstance(node, list):
            for i in range(len(node)):
                nv, ok = walk(node[i])
                node[i] = nv
                done = done and ok
            return node, done
        if isinstance(node, str) and "${" in node:
            try:
                nv = resolve_value(node)
                return nv, not (isinstance(nv, str) and "${" in nv)
            except KeyError:
                return node, False
        return node, True

    for _ in range(10):
        _, done = walk(cfg)
        if done:
            return
    # leave stragglers (e.g. references into groups that were never composed)
    _, done = walk(cfg)
    if not done:
        def collect(node, prefix=""):
            if isinstance(node, dict):
                for k, v in node.items():
                    collect(v, f"{prefix}{k}.")
            elif isinstance(node, str) and "${" in node:
                unresolved.append(prefix[:-1] + " = " + node)
        collect(cfg)


def compose(config_dir: str, config_name: str, overrides: Optional[List[str]] = None,
            now: Optional[_dt.datetime] = None) -> Config:
    """Compose a config the way ``@hydra.main`` would for the reference tree."""
    overrides = overrides or []
    now = now or _dt.datetime.now()
    parsed = parse_cli_overrides(overrides)

    root_path = _find_config_file(config_dir, "", config_name)
    root_data, _ = _load_yaml(root_path)
    root_defaults = _parse_defaults(root_data.pop("defaults", []) or [])

    # --- phase 1: resolve group choices -------------------------------------
    choices: Dict[str, Optional[str]] = {}
    order: List[str] = []
    self_pos = len(root_defaults)
    for i, e in enumerate(root_defaults):
        if e.is_self:
            self_pos = i
            continue
        choices[e.group] = e.option
        order.append(e.group)

    kv_overrides = []
    for kind, key, value in parsed:
        if kind == "set" and key in choices and (value is None or isinstance(value, str)):
            choices[key] = None if value in (None, "null") else _strip_yaml_ext(str(value))
        elif kind == "add" and "." not in key and isinstance(value, str) and \
                os.path.isdir(os.path.join(config_dir, key)):
            choices[key] = _strip_yaml_ext(value)
            order.append(key)
        else:
            kv_overrides.append((kind, key, value))

    # experiment/debug files may carry `override /group:` directives that retarget
    # earlier group choices; pre-scan them before composing anything.
    group_overrides: Dict[str, Optional[str]] = {}
    for grp in order:
        opt = choices.get(grp)
        if opt is None:
            continue
        try:
            data, _ = _load_yaml(_find_config_file(config_dir, grp, opt))
        except FileNotFoundError:
            continue
        for e in _parse_defaults(data.get("defaults", []) or [], own_group=grp):
            if e.is_override and e.group in choices:
                group_overrides.setdefault(e.group, e.option)
    for g, o in group_overrides.items():
        choices[g] = o

    # --- phase 2: compose in order -------------------------------------------
    cfg: Dict = {}
    late_overrides: Dict[str, Optional[str]] = {}

    def compose_group(grp: str) -> None:
        opt = choices.get(grp)
        if opt is None:
            return
        _compose_file(config_dir, grp, opt, cfg, late_overrides)

    pos = 0
    for i, e in enumerate(root_defaults):
        if e.is_self:
            _deep_merge(cfg, root_data)
        elif not e.is_override:
            compose_group(e.group)
        pos = i
    if self_pos >= len(root_defaults):
        _deep_merge(cfg, root_data)
    for grp in order:
        if grp not in [e.group for e in root_defaults]:
            compose_group(grp)

    # --- phase 3: CLI key=value overrides ------------------------------------
    for kind, key, value in kv_overrides:
        if kind == "del":
            _del_dotted(cfg, key)
        else:
            _set_dotted(cfg, key, value, allow_new=True)

    _resolve_interpolations(cfg, now)
    return Config.wrap(cfg)
