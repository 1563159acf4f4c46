package graft.relational

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property pin for q166's pruning argument (engine-free, the
  * RangeBucketProps discipline): the downward-closure candidate set —
  * pairs-joined-on-a-shared-first-item, closed by requiring the third
  * pair frequent — LOSES NO frequent triple (Agrawal–Srikant: every
  * subset of a frequent itemset is frequent, so every frequent triple
  * survives the prune), and counting only candidate triples therefore
  * equals brute-force counting of ALL triples. This is the theorem
  * both DataFrame routes ([[Apriori.countTriples]]) rest on;
  * AprioriRouteSpec pins the plans, this pins the model. */
object AprioriProps extends Properties("Apriori") {

  private val items = ('a' to 'h').map(_.toString)
  private val basketGen: Gen[Set[String]] =
    Gen.someOf(items).map(_.toSet)
  private val corpusGen: Gen[List[Set[String]]] =
    Gen.listOfN(12, basketGen).map(_.filter(_.nonEmpty))
  private val thrGen: Gen[Int] = Gen.chooseNum(1, 4)

  private def sortedTriple(s: Set[String]): (String, String, String) = {
    val Seq(a, b, c) = s.toSeq.sorted
    (a, b, c)
  }

  property("downward-closure candidates + candidate-only counting ≡ brute-force frequent triples") =
    forAll(corpusGen, thrGen) { (baskets: List[Set[String]], thr: Int) =>
      val tripleCounts = baskets
        .flatMap(_.subsets(3).map(sortedTriple))
        .groupBy(identity).view.mapValues(_.size).toMap
      val brute = tripleCounts.filter(_._2 >= thr)
      // the pipeline's model: frequent pairs → closed candidates →
      // count candidates only → threshold
      val pairCounts = baskets
        .flatMap(_.subsets(2).map(s => {
          val Seq(a, b) = s.toSeq.sorted; (a, b)
        }))
        .groupBy(identity).view.mapValues(_.size).toMap
      val pairs = pairCounts.filter(_._2 >= thr).keySet
      val cand = for {
        (i1, i2) <- pairs
        (j1, i3) <- pairs if j1 == i1 && i2 < i3
        if pairs.contains((i2, i3))
      } yield (i1, i2, i3)
      val viaCandidates = tripleCounts.view
        .filterKeys(cand.contains).filter(_._2 >= thr).toMap
      viaCandidates == brute
    }

  property("the closure leg is load-bearing: unclosed candidates admit triples whose (i2,i3) pair is infrequent") =
    // a corpus where {a,b} and {a,c} are frequent but {b,c} never
    // co-occurs: the unclosed join emits (a,b,c), the closed one must
    // not — pins that the third-pair semi-join is not decorative
    forAll(Gen.chooseNum(2, 6)) { thr =>
      val baskets =
        List.fill(thr)(Set("a", "b")) ++ List.fill(thr)(Set("a", "c"))
      val pairs = Set(("a", "b"), ("a", "c"))
      val unclosed = for {
        (i1, i2) <- pairs; (j1, i3) <- pairs
        if j1 == i1 && i2 < i3
      } yield (i1, i2, i3)
      val closed = unclosed.filter(t => pairs.contains((t._2, t._3)))
      unclosed == Set(("a", "b", "c")) && closed.isEmpty &&
        !baskets.exists(b => Set("b", "c").subsetOf(b))
    }
}
