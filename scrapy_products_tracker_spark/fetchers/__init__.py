from .http import fetch_http
from .synthetic import FAIL_HW, FAIL_LOGIC, OK, RETRY, classify_fetch, fetch_payloads, resolve_pages

__all__ = ["FAIL_HW", "FAIL_LOGIC", "OK", "RETRY", "classify_fetch", "fetch_http", "fetch_payloads", "resolve_pages"]
