"""Model-query filters (ref utils/filters.py:12-144 + utils/filters.ini).

Grammar (from CLI/INI strings, parsed per typed key):
- empty string            -> any value (of the key's type)
- 'not ...' prefix        -> negation
- 'a...b' / '100..'       -> interval (open ends allowed)
- comma/space lists       -> value sets
- single token            -> singleton set (bools parse 'true')

``DictOfListsOfParamFilters`` ANDs lists of filters per key over the flat
model dicts from dictify; ``MetaFilter`` builds and/or trees.
"""

import re
from typing import Any, Dict, Optional

import numpy as np

_INTERVAL_RE = re.compile(r'\.{2,}')
_LIST_RE = re.compile(r'[\s\,]+\s*')


class ParamFilter:
    def __init__(self, type=str, interval=None, values=None, neg=False,
                 any_value=False, always_true=False):
        assert bool(interval) + (values is not None) + any_value + always_true == 1
        self.type = type
        self.neg = neg
        self.interval = interval
        self.values = values
        self.any_value = any_value
        self.always_true = always_true

    @classmethod
    def from_string(cls, arg_str: Optional[str] = '', type=str) -> 'ParamFilter':
        if arg_str is None:
            return cls(always_true=True, type=type)
        parts = arg_str.split()
        neg = bool(parts) and parts[0].lower() == 'not'
        if neg:
            parts = parts[1:]
        s = ' '.join(parts)

        if _INTERVAL_RE.search(s):
            ends = _INTERVAL_RE.split(s)
            interval = [-np.inf, np.inf]
            for i in (0, -1):
                try:
                    interval[i] = type(ends[i])
                except (ValueError, TypeError):
                    pass
            return cls(type=type, interval=interval, neg=neg)
        if _LIST_RE.search(s):
            return cls(type=type, values=[type(v) for v in _LIST_RE.split(s)],
                       neg=neg)
        if not s:
            return cls(type=type, any_value=True, neg=neg)
        if type is bool:
            return cls(type=type, values=[s.lower() == 'true'], neg=neg)
        return cls(type=type, values=[type(s)], neg=neg)

    def filter(self, value) -> bool:
        if self.always_true:
            return not self.neg
        if isinstance(value, list):
            sub = [self.filter(v) for v in value]
            return all(sub) if self.neg else any(sub)
        if self.any_value:
            return isinstance(value, self.type) ^ self.neg
        if self.interval:
            try:
                a, b = self.interval
                return (a <= value <= b) ^ self.neg
            except TypeError:
                return self.neg
        return (value in self.values) ^ self.neg

    def __call__(self, value) -> bool:
        return self.filter(value)

    def __str__(self):
        if self.always_true:
            s = 'always true'
        elif self.any_value:
            s = 'any'
        elif self.interval:
            s = 'in [' + '...'.join(str(_) for _ in self.interval) + ']'
        else:
            s = 'in ' + ', '.join(str(_) for _ in self.values)
        return ('not ' if self.neg else '') + s


class ListOfParamFilters(list):
    """ANDed filters for one key (ref utils/filters.py:147-176)."""

    def filter(self, value) -> bool:
        return all(f.filter(value) for f in self)

    __call__ = filter


class DictOfListsOfParamFilters(dict):
    """key -> ListOfParamFilters; a model dict passes iff every key passes
    (ref utils/filters.py:179-220)."""

    def add(self, key: str, filter: ParamFilter):
        self.setdefault(key, ListOfParamFilters()).append(filter)

    def filter(self, d: Dict[str, Any]) -> bool:
        return all(filters.filter(d.get(key))
                   for key, filters in self.items())

    __call__ = filter


class MetaFilter:
    """and/or tree over DictOfListsOfParamFilters
    (ref utils/filters.py:223-260)."""

    def __init__(self, operator: str = 'and', *filters):
        assert operator in ('and', 'or')
        self.operator = operator
        self.filters = list(filters)

    def filter(self, d: Dict[str, Any]) -> bool:
        op = all if self.operator == 'and' else any
        return op(f.filter(d) for f in self.filters)

    __call__ = filter


# filter-key schema: key -> (type, aliases) — the spirit of utils/filters.ini
FILTER_KEYS: Dict[str, dict] = {
    'job': {'type': int},
    'set': {'type': str, 'aliases': ['dataset']},
    'type': {'type': str},
    'arch': {'type': str},
    'features': {'type': str},
    'depth': {'type': int},
    'width': {'type': int},
    'sigma': {'type': float},
    'beta': {'type': float},
    'gamma': {'type': float},
    'latent_dim': {'type': int, 'aliases': ['K']},
    'latent_sampling': {'type': int, 'aliases': ['L']},
    'prior': {'type': str},
    'prior_means': {'type': str},
    'tilted_tau': {'type': float},
    'learned_prior_means': {'type': bool},
    'forced_var': {'type': float},
    'output_distribution': {'type': str},
    'batch_norm': {'type': str},
    'optim': {'type': str},
    'lr': {'type': float},
    'epochs': {'type': int},
    'done': {'type': int},
    'validation': {'type': int},
    'wim': {'type': bool},
    'wim_prior': {'type': str},
    'wim_mean': {'type': float},
    'wim_alpha': {'type': float},
    'finished': {'type': bool},
}


def get_filter_keys() -> Dict[str, dict]:
    return dict(FILTER_KEYS)


def filters_from_dict(d: Dict[str, str]) -> DictOfListsOfParamFilters:
    """Build filters from {key: filter-string} using the key schema."""
    alias_to_key = {}
    for k, spec in FILTER_KEYS.items():
        alias_to_key[k] = k
        for a in spec.get('aliases', ()):
            alias_to_key[a] = k
    out = DictOfListsOfParamFilters()
    for k, s in d.items():
        key = alias_to_key.get(k, k)
        t = FILTER_KEYS.get(key, {}).get('type', str)
        out.add(key, ParamFilter.from_string(s, type=t))
    return out
