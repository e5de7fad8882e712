"""Display formatters for cost analytics (reference
de_polars/utils/formatters.py:14-341 — same output contract, function-style
API).

All pure Python on already-aggregated scalars; never applied to
DataFrame columns (formatting inside a query would force strings through
the engine — presentation belongs at the edge).
"""

from __future__ import annotations

from datetime import date, datetime

_ABBREVS = ((1_000_000_000, "B"), (1_000_000, "M"), (1_000, "K"))


def format_currency(
    amount,
    currency: str = "USD",
    precision: int = 2,
    include_symbol: bool = True,
) -> str:
    """``1234567.89 -> '$1,234,567.89'`` (formatters.py:14-49)."""
    if amount is None:
        return "N/A"
    try:
        text = f"{float(amount):,.{precision}f}"
    except (TypeError, ValueError):
        return "Invalid Amount"
    if not include_symbol:
        return text
    return f"${text}" if currency == "USD" else f"{text} {currency}"


def format_large_currency(amount, currency: str = "USD", abbreviate: bool = True) -> str:
    """``1_250_000 -> '$1.25M'`` (formatters.py:51-104). Precision steps
    down as the abbreviated magnitude grows: <10 -> 2dp, <100 -> 1dp,
    else 0dp."""
    if amount is None:
        return "N/A"
    try:
        value = float(amount)
    except (TypeError, ValueError):
        return "Invalid Amount"
    if not abbreviate:
        return format_currency(value, currency)
    for cutoff, suffix in _ABBREVS:
        if abs(value) >= cutoff:
            scaled = value / cutoff
            precision = 0 if scaled >= 100 else (1 if scaled >= 10 else 2)
            text = f"{scaled:.{precision}f}{suffix}"
            return f"${text}" if currency == "USD" else f"{text} {currency}"
    return format_currency(value, currency)


def format_percentage(value, precision: int = 1, include_sign: bool = True) -> str:
    """``15.7 -> '+15.7%'`` (formatters.py:111-138)."""
    if value is None:
        return "N/A"
    try:
        value = float(value)
    except (TypeError, ValueError):
        return "Invalid Percentage"
    text = f"{value:.{precision}f}%"
    return f"+{text}" if include_sign and value > 0 else text


def format_number(value, precision: int = 0, thousands_separator: bool = True) -> str:
    """Plain numeric formatting (formatters.py:141-167)."""
    if value is None:
        return "N/A"
    try:
        value = float(value)
    except (TypeError, ValueError):
        return "Invalid Number"
    return f"{value:,.{precision}f}" if thousands_separator else f"{value:.{precision}f}"


def format_large_number(value, abbreviate: bool = True) -> str:
    """``1_500_000 -> '1.5M'`` (formatters.py:170-207). Note the
    reference's precision rule differs from the currency one: <10 -> 1dp,
    else 0dp."""
    if value is None:
        return "N/A"
    try:
        value = float(value)
    except (TypeError, ValueError):
        return "Invalid Number"
    if not abbreviate:
        return format_number(value)
    for cutoff, suffix in _ABBREVS:
        if abs(value) >= cutoff:
            scaled = value / cutoff
            precision = 1 if scaled < 10 else 0
            return f"{scaled:.{precision}f}{suffix}"
    return format_number(value)


#: per-export-type partition date format (formatters.py:214-219)
DATE_FORMATS = {
    "CUR2.0": "%Y-%m",
    "FOCUS1.0": "%Y-%m",
    "COH": "%Y-%m-%d",
    "CARBON_EMISSION": "%Y-%m",
}

_DISPLAY_FORMATS = {
    "YYYY-MM": "%Y-%m",
    "YYYY-MM-DD": "%Y-%m-%d",
    "Mon YYYY": "%b %Y",
    "Month YYYY": "%B %Y",
}


def format_billing_period(
    date_value, export_type: str = "CUR2.0", display_format: str = "YYYY-MM"
) -> str:
    """Render a billing-period value (formatters.py:221-265). Strings are
    parsed from the common export formats; unparseable strings are
    returned as-is (reference behavior)."""
    if date_value is None:
        return "N/A"
    if isinstance(date_value, str):
        for fmt in ("%Y-%m-%d", "%Y-%m", "%Y-%m-%d %H:%M:%S"):
            try:
                date_value = datetime.strptime(date_value, fmt)
                break
            except ValueError:
                continue
        else:
            return date_value
    try:
        return date_value.strftime(_DISPLAY_FORMATS.get(display_format, display_format))
    except (AttributeError, TypeError, ValueError):
        return str(date_value) if date_value else "Invalid Date"


def format_relative_date(date_value, now: datetime | None = None) -> str:
    """'Today' / '3 days ago' / '2 months ago' (formatters.py:268-310).
    ``now`` is injectable for deterministic tests (the reference reads the
    wall clock inline)."""
    if date_value is None:
        return "N/A"
    try:
        if isinstance(date_value, str):
            date_value = datetime.strptime(date_value, "%Y-%m-%d")
        elif isinstance(date_value, date) and not isinstance(date_value, datetime):
            date_value = datetime.combine(date_value, datetime.min.time())
        days = ((now or datetime.now()) - date_value).days
    except (AttributeError, TypeError, ValueError):
        return "Invalid Date"
    if days == 0:
        return "Today"
    if days == 1:
        return "Yesterday"
    if days < 7:
        return f"{days} days ago"
    if days < 30:
        weeks = days // 7
        return f"{weeks} week{'s' if weeks > 1 else ''} ago"
    if days < 365:
        months = days // 30
        return f"{months} month{'s' if months > 1 else ''} ago"
    years = days // 365
    return f"{years} year{'s' if years > 1 else ''} ago"


def get_date_range_description(
    start_date: str | None, end_date: str | None, export_type: str = "CUR2.0"
) -> str:
    """'Jan 2025 to Mar 2025' etc. (formatters.py:313-341)."""
    if not start_date and not end_date:
        return "All available data"
    start_text = (
        format_billing_period(start_date, export_type, "Mon YYYY")
        if start_date
        else "Beginning"
    )
    end_text = (
        format_billing_period(end_date, export_type, "Mon YYYY") if end_date else "Latest"
    )
    if start_date and end_date:
        return start_text if start_date == end_date else f"{start_text} to {end_text}"
    return f"From {start_text}" if start_date else f"Through {end_text}"
