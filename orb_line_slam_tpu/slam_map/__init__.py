from .map_store import MapStore
