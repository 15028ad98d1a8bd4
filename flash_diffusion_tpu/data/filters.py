"""Sample filters for the streaming pipeline.

Re-derivations of the reference filters
(reference: src/flash/data/filters/filters.py:9-63, filter_wrapper.py:6-36):
pure predicates over sample dicts.
"""

from __future__ import annotations

from dataclasses import field
from typing import Any, Callable, Dict, List, Optional

from pydantic.dataclasses import dataclass

from ..config import BaseConfig


@dataclass
class BaseFilterConfig(BaseConfig):
    verbose: bool = False


class BaseFilter:
    def __init__(self, config: Optional[BaseFilterConfig] = None):
        self.config = config or BaseFilterConfig()

    def __call__(self, sample: Dict[str, Any]) -> bool:
        raise NotImplementedError


@dataclass
class KeyFilterConfig(BaseFilterConfig):
    keys: List[str] = field(default_factory=lambda: ["jpg", "txt"])


class KeyFilter(BaseFilter):
    """Keep samples that contain ALL configured keys."""

    def __init__(self, config: KeyFilterConfig):
        super().__init__(config)
        self.keys = set(config.keys)

    def __call__(self, sample):
        return self.keys.issubset(sample.keys())


@dataclass
class FilterOnConditionConfig(BaseFilterConfig):
    condition_key: str = "aesthetic_score"
    # missing-key policy: strict=True drops the sample, False keeps it
    strict: bool = True


class FilterOnCondition(BaseFilter):
    """Keep samples where ``predicate(sample[key])`` holds."""

    def __init__(self, config: FilterOnConditionConfig, predicate: Callable[[Any], bool]):
        super().__init__(config)
        self.predicate = predicate

    def __call__(self, sample):
        key = self.config.condition_key
        if key not in sample:
            return not self.config.strict
        return bool(self.predicate(sample[key]))


class FilterWrapper:
    """AND-chain of filters (reference filter_wrapper.py)."""

    def __init__(self, filters):
        self.filters = list(filters)

    def __call__(self, sample):
        return all(f(sample) for f in self.filters)
