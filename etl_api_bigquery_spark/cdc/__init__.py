from .generator import change_feed, feed_schema
from .oracle import expected_final_state

__all__ = ["change_feed", "feed_schema", "expected_final_state"]
