package graft.tools

/** The ONE normalization pipeline behind plan hashing (ADVICE r4):
  * [[graft.Bench]] hashes `sha(plan)` into the bench record's
  * `plan_sha`, and [[PlanDump]] prints `normalize`/`canonical` of the
  * same plan — sharing this object is what makes PlanDump's diffs
  * show exactly (and only) differences the hash sees.
  *
  * `normalize` strips run-varying ids: expression #ids, plan_id,
  * object addresses, AQE stage numbers, codegen span ids, lambda
  * class suffixes, and the build side of a BHJ where both sides fit
  * (AQE puts whichever stage materialized first on the build side).
  * `canonical` then sorts the stripped node lines — the tree RENDERING
  * is order-dependent under AQE child flips, but the node multiset
  * still catches every regression the hash exists for (new exchange,
  * lost pushdown, BNLJ, extra scan).
  */
object PlanCanon {

  def normalize(plan: String): String = {
    val base = plan
      .replaceAll("#\\d+", "#")
      .replaceAll("plan_id=\\d+", "plan_id=")
      .replaceAll("@[0-9a-fA-F]+", "@")
      .replaceAll("id=#?\\d+", "id=")
      .replaceAll("QueryStage \\d+", "QueryStage")
      .replaceAll("\\*\\(\\d+\\)", "*")
      .replaceAll("\\$\\$?Lambda\\$\\d+/0x[0-9a-fA-F]+", "\\$Lambda")
      .replaceAll("BuildLeft|BuildRight", "Build")
    // broadcast-mode key ordinals are physical slot positions in the
    // build row — AQE exchange reuse legitimately shifts them without
    // changing which columns are keyed (seen live: a bench run hashed
    // differently on input[0,1] vs input[1,2] alone). Scoped to the
    // broadcast-mode lines themselves (ADVICE r5): a BoundReference
    // ordinal anywhere ELSE in the plan is a real slot choice the
    // hash must keep seeing.
    base.linesIterator.map { l =>
      if (l.contains("HashedRelationBroadcastMode") || l.contains("BroadcastExchange"))
        l.replaceAll("input\\[\\d+", "input[")
      else l
    }.mkString("\n")
  }

  /** Sorted canonical node lines of a normalized plan — the exact
    * string [[sha]] hashes.
    */
  def canonical(plan: String): String =
    normalize(plan).linesIterator
      .map(_.replaceAll("^[\\s:+|-]*", "")).filter(_.nonEmpty)
      .toSeq.sorted.mkString("\n")

  /** 48-bit hex SHA-1 of [[canonical]] — the bench record's plan_sha. */
  def sha(plan: String): String = {
    val d = java.security.MessageDigest.getInstance("SHA-1")
      .digest(canonical(plan).getBytes(java.nio.charset.StandardCharsets.UTF_8))
    d.take(6).map(b => f"$b%02x").mkString
  }
}
