from . import datetimes, strings  # noqa: F401
