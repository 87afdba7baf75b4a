from .listings import clean_dexters, clean_zoopla, unify_listings  # noqa: F401
from .stations import build_station_dimension  # noqa: F401
from .air import hourly_air_rollup, ingest_air_payloads, map_stations_to_sites  # noqa: F401
from .serving import station_air_summary, station_price_summary  # noqa: F401
