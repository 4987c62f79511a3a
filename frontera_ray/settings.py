"""Settings-driven configuration surface.

Re-expresses (public semantics, no code copied) the reference's primary
extension mechanism: ``load_object`` dotted-path loading
(frontera/utils/misc.py:22-45), the UPPERCASE-attribute ``Settings``
object (frontera/settings/__init__.py) and the subset of
``default_settings.py`` knobs that map onto the Ray rebuild. Backends,
message buses and storage adapters from the reference's defaults have
no counterpart here by design — actors + Arrow replace them — so only
engine-meaningful keys are carried.

Builders at the bottom turn a Settings object into a configured
``LocalFrontier`` / ``RayCrawler``, which stay plain-kwargs classes —
settings are a veneer, not a dependency.
"""

from __future__ import annotations

from importlib import import_module


def load_object(path: str):
    """Load a class/function/variable from its dotted path
    (``pkg.module.Name`` — reference utils/misc.py:22-45 contract)."""
    try:
        dot = path.rindex(".")
    except ValueError:
        raise ValueError(f"Error loading object '{path}': not a full path")
    module, name = path[:dot], path[dot + 1:]
    mod = import_module(module)
    try:
        return getattr(mod, name)
    except AttributeError:
        raise NameError(
            f"Module '{module}' doesn't define any object named '{name}'")


DEFAULT_SETTINGS: dict = {
    # crawl loop
    "MAX_NEXT_REQUESTS": 64,
    "MAX_REQUESTS": 0,
    "TEST_MODE": False,
    # strategy / solver / codec (dotted path, or a registry short name)
    "STRATEGY": "frontera_ray.strategies.BasicStrategy",
    "STRATEGY_ARGS": {},
    "CANONICAL_SOLVER": "basic",
    "MESSAGE_BUS_CODEC": "json",
    # fingerprint functions (reference default_settings.py:13,87: sha1
    # for URLs, hostname_local_fingerprint for domains) — dotted paths
    "URL_FINGERPRINT_FUNCTION": "frontera_ray.fingerprint.sha1",
    "DOMAIN_FINGERPRINT_FUNCTION":
        "frontera_ray.fingerprint.hostname_local_fingerprint",
    # ordering profile ('min_score' = the reference memory/SQLAlchemy
    # semantics the golden corpus encodes; 'max_score' = HBase/production)
    "QUEUE_PROFILE": "min_score",
    # broad-crawl batch shaping
    "BC_MIN_REQUESTS": 64,
    "BC_MIN_HOSTS": 24,
    "BC_MAX_REQUESTS_PER_HOST": 128,
    # overused buffer purging
    "OVERUSED_MAX_PER_KEY": None,
    "OVERUSED_KEEP_PER_KEY": 1000,
    "OVERUSED_MAX_KEYS": None,
    "OVERUSED_KEEP_KEYS": 100,
    "OVERUSED_KEY_TYPE": "domain",  # or 'ip' (needs OVERUSED_IP_RESOLVER)
    "OVERUSED_IP_RESOLVER": None,
    # politeness / filtering
    "ROBOTS_ENABLED": False,
    "MAX_PAGES_PER_DOMAIN": None,  # reference DISCOVERY_MAX_PAGES role
    "DOMAINS_BLACKLIST": None,
    # sharding (ray-specific; SPIDER_FEED_PARTITIONS is honored as an
    # alias for queue shards to ease migration)
    "NUM_STATE_SHARDS": 4,
    "NUM_QUEUE_SHARDS": 4,
    "BATCH_PER_SHARD": 512,
    # URL-seen memory mode
    "STATE_CACHE_SIZE_LIMIT": 0,  # 0 = exact dict; >0 = bloom+overlay cap
    "CHECKPOINT_EVERY": 0,
}


class Settings:
    """UPPERCASE-attribute settings container (reference BaseSettings
    contract): init from a module path / module object / dict; reads
    fall back to defaults."""

    def __init__(self, module=None, attributes: dict | None = None):
        self.__dict__["attributes"] = dict(DEFAULT_SETTINGS)
        if isinstance(module, dict):  # plain-dict source
            self.set_from_dict(module)
        elif module:
            self.add_module(module)
        if attributes:
            self.set_from_dict(attributes)

    @classmethod
    def from_params(cls, **kwargs) -> "Settings":
        return cls(attributes={k.upper(): v for k, v in kwargs.items()})

    @classmethod
    def object_from(cls, settings) -> "Settings":
        if isinstance(settings, Settings):
            return settings
        return cls(settings)

    def add_module(self, module) -> None:
        if isinstance(module, str):
            module = import_module(module)
        for key in dir(module):
            if key.isupper():
                self.set(key, getattr(module, key))

    def get(self, key: str, default=None):
        if not key.isupper():
            return None
        return self.attributes.get(key, default)

    def set(self, key: str, value) -> None:
        if key.isupper():
            self.attributes[key] = value

    def set_from_dict(self, attributes: dict) -> None:
        for k, v in attributes.items():
            self.set(k, v)

    def __getattr__(self, name: str):
        if name.isupper() and name in self.__dict__["attributes"]:
            return self.__dict__["attributes"][name]
        raise AttributeError(name)

    def __setattr__(self, name: str, value) -> None:
        if name.isupper():
            self.attributes[name] = value
        else:
            self.__dict__[name] = value


def _strategy_from(settings: Settings):
    from .strategies import STRATEGIES

    spec = settings.STRATEGY
    args = settings.get("STRATEGY_ARGS") or {}
    if isinstance(spec, str):
        cls = STRATEGIES.get(spec) or load_object(spec)
        return cls(**args)
    return spec(**args) if isinstance(spec, type) else spec


def _queue_kwargs_from(settings: Settings) -> dict:
    kw = dict(
        max_per_key=settings.get("OVERUSED_MAX_PER_KEY"),
        keep_per_key=settings.get("OVERUSED_KEEP_PER_KEY", 1000),
        max_keys=settings.get("OVERUSED_MAX_KEYS"),
        keep_keys=settings.get("OVERUSED_KEEP_KEYS", 100),
        robots_enabled=bool(settings.get("ROBOTS_ENABLED", False)),
        max_pages_per_domain=settings.get("MAX_PAGES_PER_DOMAIN"),
        domains_blacklist=settings.get("DOMAINS_BLACKLIST"),
    )
    if settings.get("OVERUSED_KEY_TYPE", "domain") != "domain":
        kw["key_type"] = settings.OVERUSED_KEY_TYPE
        kw["ip_resolver"] = settings.get("OVERUSED_IP_RESOLVER")
    return kw


def codec_from_settings(settings=None):
    """(encode, decode) pair for MESSAGE_BUS_CODEC ('json' / 'arrow' /
    'msgpack', or a dotted path to a (enc, dec) tuple)."""
    from .codecs import CODECS

    s = Settings.object_from(settings) if settings is not None else Settings()
    spec = s.MESSAGE_BUS_CODEC
    return CODECS[spec] if spec in CODECS else load_object(spec)


def canonical_solver_from_settings(settings=None):
    """Batch canonical-solver kernel for CANONICAL_SOLVER ('basic' /
    'corporate'), pre-bound for map_batches."""
    from functools import partial

    from .filters import canonical_solver_table

    s = Settings.object_from(settings) if settings is not None else Settings()
    return partial(canonical_solver_table, mode=s.CANONICAL_SOLVER)


def fingerprint_fns_from_settings(settings=None):
    """(url_fp_fn, domain_fp_fn) resolved via load_object from the
    URL/DOMAIN_FINGERPRINT_FUNCTION keys (reference default_settings
    contract)."""
    s = Settings.object_from(settings) if settings is not None else Settings()
    return (load_object(s.URL_FINGERPRINT_FUNCTION),
            load_object(s.DOMAIN_FINGERPRINT_FUNCTION))


def _resolve_queue_shards(s, overrides) -> int:
    """Queue-shard precedence: explicit override (CLI flags / kwargs) >
    settings-module SPIDER_FEED_PARTITIONS > NUM_QUEUE_SHARDS default —
    a module's SPIDER_FEED_PARTITIONS must not clobber an explicit
    ``num_queue_shards=`` (the CLI's 'explicit flags still win'
    contract)."""
    if "NUM_QUEUE_SHARDS" in {k.upper() for k in overrides}:
        return int(s.NUM_QUEUE_SHARDS)
    return int(s.get("SPIDER_FEED_PARTITIONS") or s.NUM_QUEUE_SHARDS)


def local_frontier_from_settings(settings=None, **overrides):
    """Build a LocalFrontier from a Settings object / module path / dict
    (the reference's ``FrontierManager.from_settings`` shape)."""
    from .pipelines.local import LocalFrontier

    s = Settings.object_from(settings) if settings is not None else Settings()
    s.set_from_dict({k.upper(): v for k, v in overrides.items()})
    n_queue = _resolve_queue_shards(s, overrides)
    return LocalFrontier(
        strategy=_strategy_from(s),
        profile=s.QUEUE_PROFILE,
        num_state_shards=s.NUM_STATE_SHARDS,
        num_queue_shards=int(n_queue),
        queue_kwargs=_queue_kwargs_from(s),
        max_requests=int(s.get("MAX_REQUESTS", 0) or 0),
        max_next_requests=int(s.get("MAX_NEXT_REQUESTS", 64) or 64),
    )


def ray_crawler_from_settings(web, out_dir: str, settings=None, **overrides):
    """Build a RayCrawler from a Settings object / module path / dict."""
    from .pipelines.crawl import RayCrawler

    s = Settings.object_from(settings) if settings is not None else Settings()
    s.set_from_dict({k.upper(): v for k, v in overrides.items()})
    cache_limit = int(s.get("STATE_CACHE_SIZE_LIMIT", 0) or 0)
    return RayCrawler(
        web, out_dir,
        strategy=_strategy_from(s),
        profile=s.QUEUE_PROFILE,
        num_state_shards=s.NUM_STATE_SHARDS,
        num_queue_shards=_resolve_queue_shards(s, overrides),
        batch_per_shard=s.BATCH_PER_SHARD,
        max_per_host=s.get("BC_MAX_REQUESTS_PER_HOST"),
        min_hosts=s.get("BC_MIN_HOSTS") if s.get("TEST_MODE") else None,
        exact_states=cache_limit == 0,
        checkpoint_every=int(s.get("CHECKPOINT_EVERY", 0) or 0),
        queue_kwargs=_queue_kwargs_from(s),
    )
