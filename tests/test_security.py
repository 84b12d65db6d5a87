"""Kafka security helpers: JKS→PEM conversion and SASL option synthesis.

Reference surface: ``util/common.go:208-250`` (JksToPem, tested by
``util/common_test.go:10-23``), ``config/config.go:303-411``
(convertKfkSecurity + readConfig).
"""

from __future__ import annotations

import shutil
import subprocess

import pytest

from clickhouse_sinker_nali_spark.security import (
    jks_to_pem,
    kafka_security_options,
    parse_jaas_config,
    synthesize_jaas_config,
)

HAVE_TOOLS = shutil.which("keytool") and shutil.which("openssl")


def test_parse_jaas_config_matches_reference_readconfig():
    # reference config/config.go:398-411 splits on spaces and trims quotes
    cfg = (
        "org.apache.kafka.common.security.scram.ScramLoginModule required "
        'username="alice" password="s3cr3t";'
    )
    got = parse_jaas_config(cfg)
    assert got == {"username": "alice", "password": "s3cr3t"}


def test_parse_jaas_gssapi_keytab():
    cfg = (
        "com.sun.security.auth.module.Krb5LoginModule required "
        'useKeyTab=true keyTab="/etc/krb/client.keytab" '
        'principal="sinker@EXAMPLE.COM";'
    )
    got = parse_jaas_config(cfg)
    assert got["useKeyTab"] == "true"
    assert got["keyTab"] == "/etc/krb/client.keytab"
    assert got["principal"] == "sinker@EXAMPLE.COM"


def test_jaas_synthesis_roundtrips_through_parse():
    for mech, kwargs in [
        ("PLAIN", {"username": "u", "password": "p"}),
        ("SCRAM-SHA-256", {"username": "u", "password": "p"}),
        ("SCRAM-SHA-512", {"username": "u", "password": "p"}),
        ("GSSAPI", {"keytab": "/k.keytab", "principal": "svc@REALM"}),
    ]:
        line = synthesize_jaas_config(mech, **kwargs)
        assert line.endswith(";")
        parsed = parse_jaas_config(line)
        for key, val in kwargs.items():
            jaas_key = {"keytab": "keyTab"}.get(key, key)
            assert parsed[jaas_key] == val
    assert "ScramLoginModule" in synthesize_jaas_config("SCRAM-SHA-256", "u", "p")
    assert "PlainLoginModule" in synthesize_jaas_config("PLAIN", "u", "p")
    assert "Krb5LoginModule" in synthesize_jaas_config(
        "GSSAPI", keytab="/k", principal="a@B"
    )


def test_security_map_passthrough_with_protocol_inference():
    # java-style map → kafka.* options verbatim (convertKfkSecurity's
    # SASL/SSL containment checks drive the enables)
    opts = kafka_security_options(
        security={
            "security.protocol": "SASL_SSL",
            "sasl.mechanism": "SCRAM-SHA-512",
            "sasl.jaas.config": 'X required username="u" password="p";',
            "ssl.endpoint.identification.algorithm": "https",
        }
    )
    assert opts["kafka.security.protocol"] == "SASL_SSL"
    assert opts["kafka.sasl.mechanism"] == "SCRAM-SHA-512"
    assert opts["kafka.sasl.jaas.config"].startswith("X required")
    assert opts["kafka.ssl.endpoint.identification.algorithm"] == "https"


def test_native_tls_pem_fields_map_to_pem_typed_stores():
    # Go-native PEM paths (caCertFiles/clientCertFile/clientKeyFile,
    # util/common.go:153-178) → java PEM-typed stores
    opts = kafka_security_options(
        tls={
            "enable": True,
            "caCertFiles": "/pki/ca.pem",
            "clientCertFile": "/pki/client.cert.pem",
            "clientKeyFile": "/pki/client.key.pem",
            "endpIdentAlgo": "https",
        }
    )
    assert opts["kafka.security.protocol"] == "SSL"
    assert opts["kafka.ssl.truststore.type"] == "PEM"
    assert opts["kafka.ssl.truststore.location"] == "/pki/ca.pem"
    assert opts["kafka.ssl.keystore.type"] == "PEM"
    assert opts["kafka.ssl.keystore.location"] == "/pki/client.cert.pem"
    assert opts["kafka.ssl.keystore.key"] == "/pki/client.key.pem"
    assert opts["kafka.ssl.endpoint.identification.algorithm"] == "https"


def test_empty_endp_ident_algo_disables_hostname_verification():
    # reference GetSaramaConfig: InsecureSkipVerify = (EndpIdentAlgo == "")
    opts = kafka_security_options(
        tls={"enable": True, "trustStoreLocation": "/pki/trust.jks"}
    )
    assert opts["kafka.ssl.endpoint.identification.algorithm"] == ""
    assert opts["kafka.ssl.truststore.location"] == "/pki/trust.jks"
    assert "kafka.ssl.truststore.type" not in opts  # JKS is the java default


def test_native_sasl_scram_synthesizes_jaas():
    opts = kafka_security_options(
        sasl={
            "enable": True,
            "mechanism": "SCRAM-SHA-256",
            "username": "sinker",
            "password": "pw",
        }
    )
    assert opts["kafka.security.protocol"] == "SASL_PLAINTEXT"
    assert opts["kafka.sasl.mechanism"] == "SCRAM-SHA-256"
    parsed = parse_jaas_config(opts["kafka.sasl.jaas.config"])
    assert parsed == {"username": "sinker", "password": "pw"}


def test_native_sasl_gssapi_keytab_principal_and_service_name():
    # the reference splits principal into username@realm
    # (config/config.go:361-370); synthesis re-joins them
    opts = kafka_security_options(
        security={"security.protocol": "SASL_SSL"},
        tls={"trustStoreLocation": "/pki/trust.jks"},
        sasl={
            "enable": True,
            "mechanism": "GSSAPI",
            "gssapi": {
                "keytabPath": "/etc/krb/sinker.keytab",
                "username": "sinker",
                "realm": "EXAMPLE.COM",
                "serviceName": "kafka",
            },
        },
    )
    assert opts["kafka.security.protocol"] == "SASL_SSL"
    assert opts["kafka.sasl.kerberos.service.name"] == "kafka"
    parsed = parse_jaas_config(opts["kafka.sasl.jaas.config"])
    assert parsed["principal"] == "sinker@EXAMPLE.COM"
    assert parsed["keyTab"] == "/etc/krb/sinker.keytab"


@pytest.mark.skipif(not HAVE_TOOLS, reason="keytool/openssl not on PATH")
def test_jks_to_pem_converts_generated_keystore(tmp_path):
    # build a real JKS with keytool (reference util/common_test.go uses
    # checked-in keystores; generating one is equivalent and hermetic)
    jks = tmp_path / "kafka.client.keystore.jks"
    password = "123456"
    subprocess.run(
        [
            "keytool", "-genkeypair",
            "-alias", "client",
            "-keyalg", "RSA", "-keysize", "2048",
            "-dname", "CN=sinker-test",
            "-validity", "1",
            "-keystore", str(jks),
            "-storepass", password,
            "-keypass", password,
            "-storetype", "JKS",
        ],
        check=True, capture_output=True, timeout=120,
    )
    cert_pem, key_pem = jks_to_pem(str(jks), password, overwrite=True)
    assert cert_pem == str(jks) + ".cert.pem"
    assert key_pem == str(jks) + ".key.pem"
    cert_body = open(cert_pem).read()
    key_body = open(key_pem).read()
    assert "BEGIN CERTIFICATE" in cert_body
    assert "PRIVATE KEY" in key_body

    # idempotency contract: without overwrite, existing outputs are reused
    before = open(cert_pem).read()
    assert jks_to_pem(str(jks), password, overwrite=False) == (cert_pem, key_pem)
    assert open(cert_pem).read() == before
