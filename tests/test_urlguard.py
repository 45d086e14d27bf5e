"""Offline endpoint deny-list + redirect policy (the reference's
URLDenyListChecker / HttpRedirectValidator logic, unit-tested without a
network — the fetch itself stays out of sandbox scope)."""

from __future__ import annotations

import pytest

from geospatial_spark.sources.urlguard import (
    EndpointDeniedError,
    RedirectPolicy,
    ip_denied,
    validate_endpoint_url,
    validate_resolved,
)

DENIED_URLS = [
    "http://10.1.2.3/geo.csv",
    "http://127.0.0.1:8080/x.zip",
    "http://169.254.169.254/latest/meta-data/",   # cloud metadata
    "http://192.168.0.7/d.csv",
    "http://172.20.1.1/d.csv",
    "http://[::1]/d.csv",
    "http://[fe80::1]/d.csv",
    "http://[::ffff:10.0.0.1]/d.csv",             # v4-mapped v6
    "ftp://example.com/d.csv",                    # scheme
    "file:///etc/passwd",                         # scheme
    "http:///nohost.csv",                         # empty host
    "http://example.com:99999/d.csv",             # invalid port
]

ALLOWED_URLS = [
    "http://203.0.113.9/geo.csv",
    "https://example.com/db/geo.zip",
    "https://example.com:8443/geo.zip",
    "http://[2001:db8::1]/geo.csv",
]


@pytest.mark.parametrize("url", DENIED_URLS)
def test_denied(url):
    with pytest.raises(EndpointDeniedError):
        validate_endpoint_url(url)


@pytest.mark.parametrize("url", ALLOWED_URLS)
def test_allowed(url):
    validate_endpoint_url(url)  # no raise


def test_require_https():
    with pytest.raises(EndpointDeniedError, match="https required"):
        validate_endpoint_url("http://203.0.113.9/x.csv",
                              require_https=True)


def test_custom_deny_cidr():
    with pytest.raises(EndpointDeniedError):
        validate_endpoint_url("http://203.0.113.9/x.csv",
                              deny_cidrs=("203.0.113.0/24",))


def test_resolved_addresses_rechecked():
    """DNS rebinding: a public NAME resolving into a denied range is
    refused by the post-resolution check."""
    validate_endpoint_url("https://innocent.example.com/x.zip")
    with pytest.raises(EndpointDeniedError, match="denied address"):
        validate_resolved("https://innocent.example.com/x.zip",
                          ["203.0.113.9", "169.254.169.254"])
    validate_resolved("https://innocent.example.com/x.zip",
                      ["203.0.113.9"])


def test_ip_denied_forms():
    assert ip_denied("10.0.0.1")
    assert ip_denied("::ffff:192.168.1.1")      # v4-mapped v6
    assert not ip_denied("203.0.113.9")
    assert not ip_denied("2001:db8::1")


def test_redirect_policy_hops_and_downgrade():
    p = RedirectPolicy(max_hops=2)
    u = p.next_url("https://a.example.com/x", "https://b.example.com/y")
    assert u == "https://b.example.com/y"
    u = p.next_url(u, "/z.zip")                  # relative Location
    assert u == "https://b.example.com/z.zip"
    with pytest.raises(EndpointDeniedError, match="exceeds 2 hops"):
        p.next_url(u, "https://c.example.com/w")

    p2 = RedirectPolicy()
    with pytest.raises(EndpointDeniedError, match="downgrades"):
        p2.next_url("https://a.example.com/x", "http://a.example.com/x")
    # http→https upgrade is fine
    RedirectPolicy().next_url("http://a.example.com/x",
                              "https://a.example.com/x")


def test_redirect_target_deny_listed():
    p = RedirectPolicy()
    with pytest.raises(EndpointDeniedError, match="denied range"):
        p.next_url("https://a.example.com/x",
                   "https://169.254.169.254/latest/")
