"""DuckDB-dialect oracle SQL for every SQL-expressible query.

Each entry mirrors its Spark plan *semantically step for step* — same source
mapping, same surrogate keys, same rounding — so the driver's
order-insensitive value-hash comparison (row-count + schema + hash) passes
byte-exact.  The shared CTE prefix ``SRC_STG_CTES`` is the SQL twin of
``sources/mapping.py`` + ``plans/staging.py``; model CTEs compose on top the
same way the DataFrame functions compose.

Dialect correspondence used throughout (validated by probe + tests):

| Spark                                   | DuckDB                                    |
|-----------------------------------------|-------------------------------------------|
| ``format_string('%04d', x)``            | ``printf('%04d', x)``                     |
| ``date_format(ts,'yyyy-MM-dd HH:mm:ss')``| ``strftime(ts,'%Y-%m-%d %H:%M:%S')``     |
| ``from_utc_timestamp(ts, tz)``          | ``timezone(tz, (ts||'+00')::timestamptz)``|
| ``weekofyear(d)`` (ISO)                 | ``week(d)`` (ISO)                         |
| ``datediff(end, start)``                | ``date_diff('day', start, end)``          |
| ``conv(substring(md5(s),1,15),16,10)``  | ``('0x'||substr(md5(s),1,15))::bigint``   |
| ``md5(concat_ws('-', coalesce...))``    | ``md5(concat(coalesce(...), '-', ...))``  |
"""

from __future__ import annotations

from .config import RUN_DATE, SK_NULL_SENTINEL

_S = SK_NULL_SENTINEL


def _sk(*cols: str) -> str:
    """dbt_utils.generate_surrogate_key expansion (dbt-utils 1.2.0)."""
    parts = ", '-', ".join(f"coalesce(cast({c} as varchar), '{_S}')" for c in cols)
    return f"md5(concat({parts}))"


# --- source mapping + staging (SQL twin of sources/mapping.py + plans/staging.py) ---

SRC_STG_CTES = f"""
with base as (
    select l.l_orderkey, l.l_extendedprice, l.l_shipdate,
           p.p_partkey, p.p_name, p.p_brand, p.p_type, p.p_size
    from lineitem l
    join part p on l.l_partkey = p.p_partkey
),

src_raw as (
    select
        p_partkey,
        p_name as track_name,
        p_brand as track_album,
        replace(p_type, ' ', ', ') as track_artists,
        case
            when p_partkey % 3 = 0
                then printf('%04d-%02d-%02d', 1990 + p_partkey % 30, 1 + p_partkey % 12, 1 + p_partkey % 28)
            when p_partkey % 3 = 1
                then printf('%04d', 1990 + p_partkey % 30)
            else printf('%04d-%02d', 1990 + p_partkey % 30, 1 + p_partkey % 12)
        end as album_release_date,
        case when p_partkey % 3 = 0 then 'day'
             when p_partkey % 3 = 1 then 'year'
             else 'month' end as release_date_precision,
        case when p_partkey % 7 = 0 then null
             else cast(p_partkey % 101 as double) end as track_popularity,
        strftime(l_shipdate, '%Y-%m-%d %H:%M:%S') as played_at,
        case when l_orderkey % 4 = 0 then 'album'
             when l_orderkey % 4 = 1 then 'playlist'
             when l_orderkey % 4 = 2 then 'artist'
             else null end as context,
        cast(30000 + cast(floor(l_extendedprice) as bigint) % 570001 as double) as duration_ms
    from base
),

src as (
    select track_name, track_album, track_artists, album_release_date,
           release_date_precision, track_popularity, played_at, context, duration_ms
    from (
        select *,
               -- (duration, context, partkey) is a TOTAL order: the winner
               -- is deterministic even if two parts collide on the play key
               row_number() over (
                   partition by track_name, track_album, track_artists, played_at
                   order by duration_ms, coalesce(context, '~'), p_partkey
               ) as rn
        from src_raw
    )
    where rn = 1
),

stg as (
    select
        {_sk('track_name', 'track_album', 'track_artists', 'played_at')} as play_id,
        {_sk('track_name', 'track_album', 'album_release_date', 'track_artists')} as track_id,
        {_sk('track_album', 'album_release_date')} as album_id,
        {_sk('track_artists')} as artist_id,
        track_name,
        track_album,
        track_artists,
        cast(
            case release_date_precision
                when 'day' then album_release_date
                when 'year' then album_release_date || '-01-01'
            end as date
        ) as album_release_date,
        cast(track_popularity as tinyint) as track_popularity,
        cast(played_at as timestamp) as played_at,
        timezone('America/Boise',
                 cast(cast(played_at as timestamp) || '+00' as timestamptz)) as played_at_mtn,
        context,
        duration_ms
    from src
)
"""

_DIM_TRACK_CTES = """
dim_track as (
    select distinct
        tr.track_id,
        tr.album_id,
        tr.track_album as album,
        tr.track_name,
        tr.track_artists as artists,
        su.total_plays,
        su.dttm_first_played,
        year(cast(su.dttm_first_played as date)) as yr_first_played,
        week(cast(su.dttm_first_played as date)) as wk_first_played,
        du.duration_ms
    from stg tr
    left join (
        select track_id, count(*) as total_plays, min(played_at_mtn) as dttm_first_played
        from stg group by track_id
    ) su on tr.track_id = su.track_id
    left join (
        select track_id, max(duration_ms) as duration_ms
        from stg group by track_id
    ) du on tr.track_id = du.track_id
)
"""

_DIM_ARTIST_CTES = """
dim_artist as (
    select distinct
        tr.artist_id,
        tr.track_artists as artists,
        su.total_plays,
        su.dttm_first_played,
        year(cast(su.dttm_first_played as date)) as yr_first_played,
        week(cast(su.dttm_first_played as date)) as wk_first_played
    from stg tr
    left join (
        select artist_id, count(*) as total_plays, min(played_at_mtn) as dttm_first_played
        from stg group by artist_id
    ) su on tr.artist_id = su.artist_id
)
"""

_DIM_ALBUM_CTES = """
dim_album as (
    select distinct album_id, track_album as album, album_release_date as release_date
    from stg
)
"""

_FCT_CTES = """
fct as (
    select play_id, track_id, album_id, played_at, played_at_mtn, track_popularity, context
    from stg
)
"""

Q1_STG = SRC_STG_CTES + "\nselect * from stg"

Q2_DIM_TRACK = SRC_STG_CTES + "," + _DIM_TRACK_CTES + "\nselect * from dim_track"

Q3_DIM_ARTIST = SRC_STG_CTES + "," + _DIM_ARTIST_CTES + "\nselect * from dim_artist"

Q4_DIM_ALBUM = SRC_STG_CTES + "," + _DIM_ALBUM_CTES + "\nselect * from dim_album"

Q5_FCT = SRC_STG_CTES + "," + _FCT_CTES + "\nselect * from fct"

Q6_RPT_TRACK_COUNTS = (
    SRC_STG_CTES + "," + _DIM_TRACK_CTES + "," + _DIM_ALBUM_CTES + "," + _FCT_CTES
    + f""",
counts as (
    select
        fct.track_id,
        count(*) as plays,
        sum(dim_track.duration_ms) / 1000 / 60 as minutes_played
    from fct
    left join dim_track on fct.track_id = dim_track.track_id
    where date_diff('day', cast(played_at as date), date '{RUN_DATE}') <= 30
    group by fct.track_id
)
select
    dim_track.track_name,
    dim_track.artists,
    dim_album.album,
    counts.plays,
    counts.minutes_played
from counts
left join dim_track on counts.track_id = dim_track.track_id
left join dim_album on dim_track.album_id = dim_album.album_id
"""
)

Q7_RPT_ARTIST_COUNTS = (
    SRC_STG_CTES + "," + _DIM_TRACK_CTES + "," + _FCT_CTES
    + f"""
select
    dim_track.artists,
    count(*) as plays,
    sum(dim_track.duration_ms) / 1000 / 60 as minutes_played
from fct
inner join dim_track on fct.track_id = dim_track.track_id
where date_diff('day', cast(played_at as date), date '{RUN_DATE}') <= 30
group by dim_track.artists
"""
)

Q8_RPT_DISCOVERY_RATE = (
    SRC_STG_CTES + "," + _DIM_TRACK_CTES + "," + _DIM_ARTIST_CTES + "," + _FCT_CTES
    + """,
wk_base as (
    select
        year(played_at_mtn) as year_played,
        week(played_at_mtn) as week_played,
        max(cast(played_at_mtn as date)) as week_dt,
        count(*) as plays,
        count(distinct dt.artists) as uniq_artists,
        count(distinct dt.track_id) as uniq_tracks
    from fct
    left join dim_track dt on fct.track_id = dt.track_id
    group by year_played, week_played
),
new_tracks as (
    select yr_first_played as year_played, wk_first_played as week_played,
           count(*) as new_tracks
    from dim_track group by 1, 2
),
new_artists as (
    select yr_first_played as year_played, wk_first_played as week_played,
           count(*) as new_artists
    from dim_artist group by 1, 2
)
select
    wk_base.year_played,
    wk_base.week_played,
    wk_base.week_dt,
    wk_base.plays,
    wk_base.uniq_artists,
    wk_base.uniq_tracks,
    new_tracks.new_tracks,
    new_artists.new_artists,
    new_tracks.new_tracks / nullif(wk_base.uniq_tracks, 0) as track_discovery_rate,
    new_artists.new_artists / nullif(wk_base.uniq_artists, 0) as artist_discovery_rate
from wk_base
left join new_tracks
    on wk_base.year_played = new_tracks.year_played and wk_base.week_played = new_tracks.week_played
left join new_artists
    on wk_base.year_played = new_artists.year_played and wk_base.week_played = new_artists.week_played
"""
)

# Ad-hoc SQL-surface proof query (sql_api.sql_top_artists): mart-over-mart
# join/aggregate; exact-integer duration sum, then two IEEE divisions.
SQL_TOP_ARTISTS = (
    SRC_STG_CTES
    + ","
    + _DIM_TRACK_CTES
    + ","
    + _FCT_CTES
    + """
select dt.artists,
       count(*) as plays,
       cast(cast(sum(cast(dt.duration_ms as bigint)) as bigint) as double) / 1000 / 60
         as minutes_played
from fct f
join dim_track dt on f.track_id = dt.track_id
group by dt.artists
"""
)
