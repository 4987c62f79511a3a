from .urlseen import BloomFilter, UrlSeenShard, States
from .queue import QueueShard, QueueEntry, DomainMetadata

__all__ = [
    "BloomFilter",
    "UrlSeenShard",
    "States",
    "QueueShard",
    "QueueEntry",
    "DomainMetadata",
]
