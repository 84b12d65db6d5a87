"""Kafka security utilities: JKS→PEM conversion and SASL option synthesis.

Spark's Kafka source *is* the Java client, so the reference's java-style
``security`` map (reference ``config/config.go:304-384`` ``convertKfkSecurity``)
passes through as ``kafka.*`` options.  What the reference adds on top — and
what this module reproduces — is the glue an enterprise deployment needs on
day one:

- **JKS→PEM** (reference ``util/common.go:208-250`` ``JksToPem``): the sinker
  converts Java keystores to PEM for its Go TLS stack via ``keytool`` +
  ``openssl``.  We keep the converter (same three-command pipeline, same
  ``<jks>.cert.pem`` / ``<jks>.key.pem`` naming) because PEM outputs are also
  what Spark needs when the cluster mounts PEM-only secrets
  (``ssl.keystore.type=PEM``).
- **JAAS parsing/synthesis** (reference ``config/config.go:398-411``
  ``readConfig`` and the GSSAPI branch of ``convertKfkSecurity``): a
  ``sasl.jaas.config`` string is parsed into key/value pairs, and a
  sinker-native SASL dict (mechanism/username/password or keytab/principal)
  is synthesized back into the JAAS line the Java client expects.
"""

from __future__ import annotations

import os
import shutil
import subprocess

__all__ = [
    "parse_jaas_config",
    "synthesize_jaas_config",
    "jks_to_pem",
    "kafka_security_options",
]


def parse_jaas_config(config: str) -> dict[str, str]:
    """Parse a ``sasl.jaas.config`` value into its key/value options.

    Port of reference ``config/config.go:398-411``: strip the trailing
    ``;``, split on spaces, keep ``k=v`` fields, trim surrounding quotes.
    The login-module class and ``required`` flag carry no ``=`` so they are
    skipped, exactly as the reference does.
    """
    out: dict[str, str] = {}
    for fld in config.rstrip(";").split(" "):
        if "=" in fld:
            key, _, value = fld.partition("=")
            out[key] = value.strip('"')
    return out


def synthesize_jaas_config(
    mechanism: str,
    username: str = "",
    password: str = "",
    keytab: str = "",
    principal: str = "",
) -> str:
    """Build the ``sasl.jaas.config`` line for a mechanism + credentials.

    Inverse of :func:`parse_jaas_config`, producing what the Java client
    (and therefore Spark's Kafka source) consumes.  GSSAPI with a keytab
    uses ``Krb5LoginModule`` (the reference's AuthType=2 path,
    ``config/config.go:348-377``); everything else uses the mechanism's
    standard login module with username/password.
    """
    if mechanism == "GSSAPI":
        if keytab:
            return (
                "com.sun.security.auth.module.Krb5LoginModule required "
                f'useKeyTab=true storeKey=true keyTab="{keytab}" '
                f'principal="{principal}";'
            )
        return (
            "com.sun.security.auth.module.Krb5LoginModule required "
            f'useTicketCache=true principal="{principal}";'
        )
    module = (
        "org.apache.kafka.common.security.scram.ScramLoginModule"
        if "SCRAM" in mechanism
        else "org.apache.kafka.common.security.plain.PlainLoginModule"
    )
    return f'{module} required username="{username}" password="{password}";'


def jks_to_pem(
    jks_path: str, jks_password: str, overwrite: bool = False
) -> tuple[str, str]:
    """Convert a JKS keystore to ``(cert_pem_path, key_pem_path)``.

    Same pipeline as reference ``util/common.go:208-250``: keytool
    re-exports the JKS as PKCS12, then openssl extracts the certificate
    (``-nokeys``) and the unencrypted private key (``-nodes -nocerts``).
    Outputs live next to the keystore as ``<name>.cert.pem`` /
    ``<name>.key.pem``; existing outputs short-circuit unless
    ``overwrite=True`` (the reference's idempotency contract, so a restart
    never re-runs keytool against live secrets).

    A truststore (certs only, no private key) yields a cert PEM and an
    empty key PEM — the reference tolerates the same (its truststore call
    only consumes the cert path).
    """
    directory, name = os.path.split(jks_path)
    cert_pem = os.path.join(directory, name + ".cert.pem")
    key_pem = os.path.join(directory, name + ".key.pem")
    p12 = os.path.join(directory, name + ".p12")
    if overwrite:
        for path in (cert_pem, key_pem, p12):
            if os.path.exists(path):
                os.remove(path)
    elif any(os.path.exists(p) for p in (cert_pem, key_pem, p12)):
        return cert_pem, key_pem

    if shutil.which("keytool") is None or shutil.which("openssl") is None:
        raise RuntimeError("jks_to_pem requires keytool and openssl on PATH")

    env = dict(os.environ, password=jks_password)
    commands: list[tuple[list[str], bytes | None]] = [
        (
            [
                "keytool", "-importkeystore",
                "-srckeystore", jks_path,
                "-destkeystore", p12,
                "-deststoretype", "PKCS12",
                "-srcstorepass", jks_password,
                "-deststorepass", jks_password,
                "-noprompt",
            ],
            None,
        ),
        (
            ["openssl", "pkcs12", "-in", p12, "-nokeys",
             "-out", cert_pem, "-passin", "env:password"],
            None,
        ),
        (
            ["openssl", "pkcs12", "-in", p12, "-nodes", "-nocerts",
             "-out", key_pem, "-passin", "env:password"],
            None,
        ),
    ]
    for argv, stdin in commands:
        proc = subprocess.run(
            argv, input=stdin, env=env,
            capture_output=True, timeout=60,
        )
        if proc.returncode != 0:
            # a certs-only truststore has no key to extract; mirror the
            # reference by leaving the key PEM empty rather than failing
            if argv[:2] == ["openssl", "pkcs12"] and "-nocerts" in argv:
                open(key_pem, "wb").close()
                continue
            raise RuntimeError(
                f"{argv[0]} failed ({proc.returncode}): "
                f"{proc.stderr.decode(errors='replace')[:500]}"
            )
    return cert_pem, key_pem


def kafka_security_options(
    security: dict[str, str] | None = None,
    tls: dict[str, object] | None = None,
    sasl: dict[str, object] | None = None,
) -> dict[str, str]:
    """Translate the reference's three security surfaces into Spark Kafka
    source options (``kafka.``-prefixed, java-client names).

    Mirrors ``convertKfkSecurity`` + ``GetSaramaConfig`` (reference
    ``config/config.go:303-385``, ``input/kafka_sarama.go:11718-11760``):

    - ``security``: java-style map — passes through verbatim (Spark IS the
      java client), with ``sasl.jaas.config`` precedence over ``sasl``.
    - ``tls``: sinker-native ``{enable, trustStoreLocation,
      trustStorePassword, keystoreLocation, keystorePassword, caCertFiles,
      clientCertFile, clientKeyFile, endpIdentAlgo, insecureSkipVerify}``.
      JKS paths map to ``ssl.*store.*``; PEM paths (the Go-native fields)
      map to the same options with ``type=PEM``.  An empty
      ``endpIdentAlgo`` disables hostname verification, matching the
      reference's ``InsecureSkipVerify = (EndpIdentAlgo == "")``.
    - ``sasl``: sinker-native ``{enable, mechanism, username, password,
      gssapi:{keytabPath, username, realm, serviceName}}`` — synthesized
      into ``sasl.mechanism`` + ``sasl.jaas.config``.
    """
    security = security or {}
    tls = dict(tls or {})
    sasl = dict(sasl or {})
    opts: dict[str, str] = {}

    protocol = str(security.get("security.protocol", ""))
    tls_on = bool(tls.get("enable")) or "SSL" in protocol
    sasl_on = bool(sasl.get("enable")) or "SASL" in protocol

    if tls_on or sasl_on:
        if protocol:
            opts["kafka.security.protocol"] = protocol
        elif tls_on and sasl_on:
            opts["kafka.security.protocol"] = "SASL_SSL"
        elif tls_on:
            opts["kafka.security.protocol"] = "SSL"
        else:
            opts["kafka.security.protocol"] = "SASL_PLAINTEXT"

    # java-style map passes straight through
    for key, value in security.items():
        if key != "security.protocol":
            opts[f"kafka.{key}"] = str(value)

    if tls_on:
        if tls.get("trustStoreLocation"):
            opts["kafka.ssl.truststore.location"] = str(tls["trustStoreLocation"])
            if tls.get("trustStorePassword"):
                opts["kafka.ssl.truststore.password"] = str(tls["trustStorePassword"])
        elif tls.get("caCertFiles"):
            # Go-native PEM CA bundle → java PEM truststore
            opts["kafka.ssl.truststore.type"] = "PEM"
            opts["kafka.ssl.truststore.location"] = str(tls["caCertFiles"])
        if tls.get("keystoreLocation"):
            opts["kafka.ssl.keystore.location"] = str(tls["keystoreLocation"])
            if tls.get("keystorePassword"):
                opts["kafka.ssl.keystore.password"] = str(tls["keystorePassword"])
        elif tls.get("clientCertFile"):
            opts["kafka.ssl.keystore.type"] = "PEM"
            opts["kafka.ssl.keystore.location"] = str(tls["clientCertFile"])
            if tls.get("clientKeyFile"):
                opts["kafka.ssl.keystore.key"] = str(tls["clientKeyFile"])
        algo = tls.get("endpIdentAlgo", "")
        if tls.get("insecureSkipVerify") or (tls.get("enable") and not algo):
            opts["kafka.ssl.endpoint.identification.algorithm"] = ""
        elif algo:
            opts["kafka.ssl.endpoint.identification.algorithm"] = str(algo)

    if sasl_on and sasl:
        mechanism = str(sasl.get("mechanism", "PLAIN"))
        opts["kafka.sasl.mechanism"] = mechanism
        gssapi = dict(sasl.get("gssapi") or {})
        if "kafka.sasl.jaas.config" not in opts:
            if mechanism == "GSSAPI":
                principal = str(gssapi.get("username", ""))
                if gssapi.get("realm"):
                    principal = f"{principal}@{gssapi['realm']}"
                opts["kafka.sasl.jaas.config"] = synthesize_jaas_config(
                    "GSSAPI",
                    keytab=str(gssapi.get("keytabPath", "")),
                    principal=principal,
                )
            else:
                opts["kafka.sasl.jaas.config"] = synthesize_jaas_config(
                    mechanism,
                    username=str(sasl.get("username", "")),
                    password=str(sasl.get("password", "")),
                )
        if mechanism == "GSSAPI" and gssapi.get("serviceName"):
            opts["kafka.sasl.kerberos.service.name"] = str(gssapi["serviceName"])
    return opts
