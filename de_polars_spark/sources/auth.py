"""AWS credential resolution (reference de_polars/auth.py:49-165).

Same four-method chain — named profile, STS role assumption, explicit
keys, default chain — with two consumers:

- :func:`get_boto3_client` for driver-side utilities (downloader,
  pricing backend); boto3 is an optional dependency, imported lazily.
- :func:`get_s3a_options` replaces the reference's Polars
  ``storage_options`` with the Spark-native equivalent: a dict of
  ``spark.hadoop.fs.s3a.*`` settings to apply on the session so
  executors (not just the driver) can read ``s3a://`` paths.
"""

from __future__ import annotations

from typing import Any, Optional


def resolve_credentials(
    aws_region: Optional[str] = None,
    aws_access_key_id: Optional[str] = None,
    aws_secret_access_key: Optional[str] = None,
    aws_session_token: Optional[str] = None,
    aws_profile: Optional[str] = None,
    role_arn: Optional[str] = None,
    external_id: Optional[str] = None,
) -> dict[str, Any]:
    """Resolve to concrete credentials following the reference chain
    (auth.py:49-101). Returns a dict with any of access_key/secret_key/
    token/region that could be determined; empty dict = default chain."""
    import boto3  # optional dependency

    if aws_profile:
        session = boto3.Session(profile_name=aws_profile)
        creds = session.get_credentials()
        out = {"region": aws_region or session.region_name}
        if creds:
            out.update(
                access_key=creds.access_key,
                secret_key=creds.secret_key,
                token=creds.token,
            )
        return {k: v for k, v in out.items() if v}

    if role_arn and not aws_access_key_id:
        sts = boto3.client("sts")
        kwargs = {"RoleArn": role_arn, "RoleSessionName": "de-polars-spark-session"}
        if external_id:
            kwargs["ExternalId"] = external_id
        creds = sts.assume_role(**kwargs)["Credentials"]
        return {
            "access_key": creds["AccessKeyId"],
            "secret_key": creds["SecretAccessKey"],
            "token": creds["SessionToken"],
            "region": aws_region,
        }

    if aws_access_key_id:
        out = {
            "access_key": aws_access_key_id,
            "secret_key": aws_secret_access_key,
            "token": aws_session_token,
            "region": aws_region,
        }
        return {k: v for k, v in out.items() if v}

    session = boto3.Session()
    creds = session.get_credentials()
    out: dict[str, Any] = {"region": aws_region or session.region_name}
    if creds:
        out.update(
            access_key=creds.access_key,
            secret_key=creds.secret_key,
            token=creds.token,
        )
    return {k: v for k, v in out.items() if v}


def get_boto3_client(service_name: str, **auth_kwargs):
    """boto3 client through the chain (auth.py:49-101)."""
    import boto3

    profile = auth_kwargs.pop("aws_profile", None)
    region = auth_kwargs.get("aws_region")
    if profile:
        return boto3.Session(profile_name=profile).client(
            service_name, region_name=region
        )
    creds = resolve_credentials(**auth_kwargs)
    kwargs: dict[str, Any] = {}
    if creds.get("region"):
        kwargs["region_name"] = creds["region"]
    if creds.get("access_key"):
        kwargs["aws_access_key_id"] = creds["access_key"]
        kwargs["aws_secret_access_key"] = creds.get("secret_key")
    if creds.get("token"):
        kwargs["aws_session_token"] = creds["token"]
    return boto3.client(service_name, **kwargs)


def s3a_options_from_credentials(creds: dict[str, Any]) -> dict[str, str]:
    """Map resolved credentials onto Hadoop S3A configuration keys (the
    Spark analog of the reference's get_storage_options, auth.py:104-165).
    Pure function — testable without boto3."""
    options: dict[str, str] = {}
    if creds.get("access_key"):
        options["spark.hadoop.fs.s3a.access.key"] = creds["access_key"]
    if creds.get("secret_key"):
        options["spark.hadoop.fs.s3a.secret.key"] = creds["secret_key"]
    if creds.get("token"):
        options["spark.hadoop.fs.s3a.session.token"] = creds["token"]
        options["spark.hadoop.fs.s3a.aws.credentials.provider"] = (
            "org.apache.hadoop.fs.s3a.TemporaryAWSCredentialsProvider"
        )
    if creds.get("region"):
        options["spark.hadoop.fs.s3a.endpoint.region"] = creds["region"]
    return options


def get_s3a_options(**auth_kwargs) -> dict[str, str]:
    """Resolve credentials and return session-level S3A settings."""
    return s3a_options_from_credentials(resolve_credentials(**auth_kwargs))


def apply_s3a_options(spark, options: dict[str, str]) -> None:
    """Apply S3A settings to a live session (hadoopConfiguration route —
    works after session start, unlike spark.conf for hadoop keys)."""
    hadoop_conf = spark.sparkContext._jsc.hadoopConfiguration()
    for key, value in options.items():
        hadoop_conf.set(key.removeprefix("spark.hadoop."), value)
