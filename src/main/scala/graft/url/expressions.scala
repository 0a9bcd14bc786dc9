package graft.url

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, IntegerType, StringType}

/** Codegen'd Catalyst expressions wrapping [[UrlOps]].
  *
  * Each generates a direct static call into `graft.url.UrlOps` (Scala
  * top-level objects emit static forwarders), so the whole gate pipeline
  * stays inside whole-stage codegen — no UDF ser/de on the hot path
  * (SURVEY §4: "custom Expression ... promoted to codegen ... UDF overhead
  * at 10^10 scale is the reason").
  */

/** `canonicalize_url(base, href)` — reference `convert_abs_path`
  * (`spider/src/utils/abs.rs:125-146`).
  */
case class CanonicalizeUrl(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def nullSafeEval(base: Any, href: Any): Any =
    UrlOps.canonUtf8(base.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      href.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, h) => s"""
      ${ev.value} = graft.url.UrlOps.canonUtf8($b, $h);
      ${ev.isNull} = ${ev.value} == null;
    """)
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

/** `url_host(url)` — reference `extract_domain` (`frontier.rs:189-202`). */
case class UrlHost(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(u: Any): Any =
    UrlOps.hostUtf8(u.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, u => s"graft.url.UrlOps.hostUtf8($u)")
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

/** `root_domain(host)` — reference `extract_root_domain` (`page.rs:2939-2955`). */
case class RootDomain(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(u: Any): Any =
    UrlOps.rootDomainUtf8(u.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, u => s"graft.url.UrlOps.rootDomainUtf8($u)")
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

/** `url_path(url)` — reference `url_path` (`frontier.rs:205-222`). */
case class UrlPathExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(u: Any): Any =
    UrlOps.urlPathUtf8(u.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, u => s"graft.url.UrlOps.urlPathUtf8($u)")
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

/** `score_url(url, depth)` — reference `score_url` (`frontier.rs:163-185`). */
case class ScoreUrl(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def nullSafeEval(u: Any, d: Any): Any =
    UrlOps.scoreUrlUtf8(u.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], d.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (u, d) => s"graft.url.UrlOps.scoreUrlUtf8($u, $d)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression) = copy(l, r)
}

/** `path_depth(url)` — segment count for the depth budget
  * (`is_over_inner_depth_budget` `website.rs:2009-2028`).
  */
case class PathDepth(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullSafeEval(u: Any): Any =
    UrlOps.pathDepthUtf8(u.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, u => s"graft.url.UrlOps.pathDepthUtf8($u)")
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

/** `is_media_asset(url)` — reference `is_media_asset_url` (`media_asset.rs:95-111`). */
case class IsMediaAsset(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def nullSafeEval(u: Any): Any =
    UrlOps.isMediaAssetUtf8(u.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, u => s"graft.url.UrlOps.isMediaAssetUtf8($u)")
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

/** `is_ignored_asset(url)` — reference extension filter
  * (`push_link_check` `page.rs:2902-2929` + `IGNORE_EXTENSIONS`).
  */
case class IsIgnoredAsset(child: Expression) extends UnaryExpression {
  override def dataType: DataType = BooleanType
  override def nullSafeEval(u: Any): Any =
    UrlOps.isIgnoredAssetUtf8(u.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, u => s"graft.url.UrlOps.isIgnoredAssetUtf8($u)")
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

/** `budget_prefixes(url)` — accumulated-segment budget keys (B7,
  * `website.rs:2051-2121`): `/en/fr/x` → ["en", "enfr", "enfrx"]. One-pass
  * codegen expression replacing the round-1 Scala UDF on the budget path.
  */
case class BudgetPrefixes(child: Expression) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.ArrayType(StringType, containsNull = false)
  override def nullSafeEval(u: Any): Any =
    UrlOps.budgetPrefixesUtf8(u.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, u => s"graft.url.UrlOps.budgetPrefixesUtf8($u)")
  override protected def withNewChildInternal(c: Expression) = copy(c)
}

/** Column-level API for the URL expressions. */
object urlfns {
  import GraftSqlBridge.{toColumn => column}
  private def e(c: Column): Expression = GraftSqlBridge.toExpression(c)
  def canonicalize_url(base: Column, href: Column): Column = column(CanonicalizeUrl(e(base), e(href)))
  def url_host(url: Column): Column = column(UrlHost(e(url)))
  def root_domain(host: Column): Column = column(RootDomain(e(host)))
  def url_path(url: Column): Column = column(UrlPathExpr(e(url)))
  def score_url(url: Column, depth: Column): Column = column(ScoreUrl(e(url), e(depth)))
  def path_depth(url: Column): Column = column(PathDepth(e(url)))
  def is_media_asset(url: Column): Column = column(IsMediaAsset(e(url)))
  def is_ignored_asset(url: Column): Column = column(IsIgnoredAsset(e(url)))
  def budget_prefixes(url: Column): Column = column(BudgetPrefixes(e(url)))
}
