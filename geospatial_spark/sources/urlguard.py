"""Remote-endpoint validation for dictionary downloads — offline.

The reference guards its ip2geo datasource endpoint twice before and
during the HTTP fetch: a URL deny-list check
(ip2geo/common/URLDenyListChecker.java — private/reserved ranges and
operator-configured CIDRs are refused, so a datasource URL cannot be
pointed at cluster-internal services) and a redirect policy
(ip2geo/common/HttpRedirectValidator.java — bounded hops, no protocol
downgrade, every hop re-validated). This sandbox has no network, so the
FETCH stays out of scope (local-CSV dictionaries only,
sources/dictionary.py) — but the validation logic itself is pure and
fully unit-testable offline; a cluster deployment wires
`validate_endpoint_url` / `RedirectPolicy` in front of its HTTP client
unchanged.

Stdlib only (ipaddress, urllib.parse). SSRF-guard semantics:
  * scheme must be http/https (no file:, ftp:, gopher:, ...);
  * a hostname that IS an ip literal is checked against the deny list
    (private, loopback, link-local, metadata, reserved, multicast —
    v4 and v6, including v4-mapped v6 forms);
  * hostname resolution is the CALLER's concern: pass the resolved
    addresses to `validate_resolved` so DNS-rebinding can't bypass the
    literal check;
  * redirects: bounded hop count, absolute or relative Location,
    https→http downgrade refused, every target re-validated.
"""

from __future__ import annotations

import ipaddress
from urllib.parse import urljoin, urlsplit

# the reference's default deny list is "RFC-1918 + service-internal";
# this is the standard SSRF set (cloud metadata endpoint included)
DEFAULT_DENY_CIDRS = (
    "0.0.0.0/8",          # "this network"
    "10.0.0.0/8",         # RFC 1918
    "100.64.0.0/10",      # CGNAT
    "127.0.0.0/8",        # loopback
    "169.254.0.0/16",     # link-local (incl. 169.254.169.254 metadata)
    "172.16.0.0/12",      # RFC 1918
    "192.168.0.0/16",     # RFC 1918
    "198.18.0.0/15",      # benchmarking
    "224.0.0.0/4",        # multicast
    "240.0.0.0/4",        # reserved
    "::1/128",            # v6 loopback
    "::/128",             # unspecified
    "fc00::/7",           # unique-local
    "fe80::/10",          # v6 link-local
    "ff00::/8",           # v6 multicast
)

ALLOWED_SCHEMES = ("http", "https")
MAX_REDIRECT_HOPS = 5


class EndpointDeniedError(ValueError):
    """URL refused by the deny-list / scheme policy."""


def _networks(cidrs) -> list:
    return [ipaddress.ip_network(c, strict=False) for c in cidrs]


def _as_ip(host: str):
    """The ip literal for a host string, or None when it is a name.
    v4-mapped v6 literals (::ffff:10.0.0.1) unwrap to their v4 form so
    the v4 deny rows catch them."""
    if not host:
        return None
    h = host.strip("[]")  # urlsplit keeps brackets on v6 literals
    try:
        ip = ipaddress.ip_address(h)
    except ValueError:
        return None
    if ip.version == 6 and ip.ipv4_mapped is not None:
        ip = ip.ipv4_mapped
    return ip


def ip_denied(ip, deny_cidrs=DEFAULT_DENY_CIDRS) -> bool:
    ip = ipaddress.ip_address(ip) if isinstance(ip, str) else ip
    if ip.version == 6 and ip.ipv4_mapped is not None:
        ip = ip.ipv4_mapped
    return any(ip in n for n in _networks(deny_cidrs)
               if n.version == ip.version)


def validate_endpoint_url(url: str,
                          deny_cidrs=DEFAULT_DENY_CIDRS,
                          require_https: bool = False) -> None:
    """Raise EndpointDeniedError unless `url` passes the scheme +
    deny-list policy (URLDenyListChecker.java analogue)."""
    parts = urlsplit(url)
    if parts.scheme not in ALLOWED_SCHEMES:
        raise EndpointDeniedError(
            f"scheme {parts.scheme!r} not allowed (http/https only): {url}")
    if require_https and parts.scheme != "https":
        raise EndpointDeniedError(f"https required: {url}")
    if not parts.hostname:
        raise EndpointDeniedError(f"URL has no host: {url}")
    try:
        parts.port  # invalid explicit port raises ValueError
    except ValueError as e:
        raise EndpointDeniedError(f"invalid port in {url}: {e}") from None
    ip = _as_ip(parts.hostname)
    if ip is not None and ip_denied(ip, deny_cidrs):
        raise EndpointDeniedError(
            f"host {parts.hostname} is in a denied range: {url}")


def validate_resolved(url: str, addresses,
                      deny_cidrs=DEFAULT_DENY_CIDRS) -> None:
    """Post-DNS check: every address the host resolved to must clear
    the deny list (DNS rebinding cannot smuggle a public name that
    resolves into 169.254.169.254 past the literal check)."""
    for a in addresses:
        if ip_denied(a, deny_cidrs):
            raise EndpointDeniedError(
                f"{url} resolves to denied address {a}")


class RedirectPolicy:
    """Bounded, downgrade-free redirect follower
    (HttpRedirectValidator.java analogue). Feed each 3xx Location
    through `next_url`; raises past max_hops, on scheme downgrade, or
    when the target fails the deny-list policy."""

    def __init__(self, max_hops: int = MAX_REDIRECT_HOPS,
                 deny_cidrs=DEFAULT_DENY_CIDRS):
        self.max_hops = int(max_hops)
        self.deny_cidrs = deny_cidrs
        self.hops = 0

    def next_url(self, current_url: str, location: str) -> str:
        self.hops += 1
        if self.hops > self.max_hops:
            raise EndpointDeniedError(
                f"redirect chain exceeds {self.max_hops} hops at "
                f"{current_url!r}")
        target = urljoin(current_url, location)  # relative → absolute
        cur_scheme = urlsplit(current_url).scheme
        new_scheme = urlsplit(target).scheme
        if cur_scheme == "https" and new_scheme == "http":
            raise EndpointDeniedError(
                f"redirect downgrades https→http: {current_url} → {target}")
        validate_endpoint_url(target, self.deny_cidrs)
        return target
