package graft.analyze

/** The six typed entity schemas declared by the reference's reader layer
  * (`app/parquet_to_polars.py:51-266`; topic→type routing `:34-44`) as Scala
  * case classes — `Dataset[T]` replaces the reference's
  * dataclass-materialization (`:350-375`).
  *
  * Shared base fields: conId, symbol, local_symbol, symbol_key, currency,
  * exchange, sec_type, timestamp, unix_timestamp_ms; calculated fields:
  * mid_price, spread, has_liquidity. Every field is Option-typed because the
  * reference constructs instances permissively (missing → None) and reports
  * drift rather than failing.
  */
object Schemas {

  /** IND (`parquet_to_polars.py:51-76`). */
  case class IndexMarketData(
    conId: Option[Long], symbol: Option[String], local_symbol: Option[String],
    symbol_key: Option[String], currency: Option[String], exchange: Option[String],
    sec_type: Option[String], timestamp: Option[String], unix_timestamp_ms: Option[Long],
    bid: Option[Double], ask: Option[Double], close: Option[Double],
    last: Option[Double], high: Option[Double], low: Option[Double],
    index_value: Option[Double],
    mid_price: Option[Double], spread: Option[Double], has_liquidity: Option[Boolean])

  /** FUT (`:79-110`). */
  case class FuturesMarketData(
    conId: Option[Long], symbol: Option[String], local_symbol: Option[String],
    symbol_key: Option[String], currency: Option[String], exchange: Option[String],
    sec_type: Option[String], timestamp: Option[String], unix_timestamp_ms: Option[Long],
    bid: Option[Double], ask: Option[Double], bid_size: Option[Double], ask_size: Option[Double],
    last: Option[Double], last_size: Option[Double], high: Option[Double], low: Option[Double],
    close: Option[Double], volume: Option[Double],
    mid_price: Option[Double], spread: Option[Double], has_liquidity: Option[Boolean])

  /** OPT (`:113-170`). */
  case class OptionsMarketData(
    conId: Option[Long], symbol: Option[String], local_symbol: Option[String],
    symbol_key: Option[String], currency: Option[String], exchange: Option[String],
    sec_type: Option[String], timestamp: Option[String], unix_timestamp_ms: Option[Long],
    bid: Option[Double], ask: Option[Double], last: Option[Double],
    strike: Option[Double], right: Option[String], expiry: Option[String],
    putOpenInterest: Option[Double], callOpenInterest: Option[Double],
    implied_vol: Option[Double], delta: Option[Double], gamma: Option[Double],
    theta: Option[Double], vega: Option[Double], underlying_price: Option[Double],
    gamma_exposure: Option[Double], weighted_gamma: Option[Double],
    days_to_expiration: Option[Long], minutes_to_expiration: Option[Long],
    mid_price: Option[Double], spread: Option[Double], has_liquidity: Option[Boolean])

  /** STK (`:173-202`). */
  case class StockMarketData(
    conId: Option[Long], symbol: Option[String], local_symbol: Option[String],
    symbol_key: Option[String], currency: Option[String], exchange: Option[String],
    sec_type: Option[String], timestamp: Option[String], unix_timestamp_ms: Option[Long],
    bid: Option[Double], ask: Option[Double], bid_size: Option[Double], ask_size: Option[Double],
    last: Option[Double], last_size: Option[Double], high: Option[Double], low: Option[Double],
    close: Option[Double], volume: Option[Double],
    mid_price: Option[Double], spread: Option[Double], has_liquidity: Option[Boolean])

  /** BAG combo leg (`:205-230`). */
  case class ComboLeg(
    conId: Option[Long], ratio: Option[Long], action: Option[String],
    exchange: Option[String])

  /** BAG (`:233-257`). */
  case class MultiLegOptionsData(
    conId: Option[Long], symbol: Option[String], local_symbol: Option[String],
    symbol_key: Option[String], currency: Option[String], exchange: Option[String],
    sec_type: Option[String], timestamp: Option[String], unix_timestamp_ms: Option[Long],
    strategy_type: Option[String], center_strike: Option[Double],
    wing_width: Option[Double], expiration: Option[String],
    combo_legs: Option[Seq[ComboLeg]], leg_count: Option[Long],
    leg_actions: Option[String], leg_conIds: Option[String],
    mid_price: Option[Double], spread: Option[Double], has_liquidity: Option[Boolean])

  /** ACCOUNT_VALUES (`:260-266`). */
  case class AccountValuesData(
    account: Option[String], timestamp: Option[String],
    values: Option[Map[String, String]], raw_count: Option[Long],
    processed_count: Option[Long])

  /** Topic-prefix → sec_type routing (reference `:34-44`). */
  val topicRouting: Map[String, String] = Map(
    "index" -> "IND", "futures" -> "FUT", "options" -> "OPT",
    "stocks" -> "STK", "bag" -> "BAG", "account" -> "ACCOUNT_VALUES")
}
